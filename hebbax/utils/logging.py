"""Observability sinks: ASCII box console reports, CSV metric logs, and an
optional TensorBoard writer.

The reference writes the same data to three sinks in lock-step
(/root/reference/utils.py:112-239, train_sup_2d.py:254-269,357-360); this
module keeps those output contracts (box width formula 42+(C-3)*7, the
train_log.csv / val_log.csv / test.csv files).
"""

import os

import pandas as pd


class BoxPrinter:
    """The reference's fixed-width console report."""

    def __init__(self, num_classes):
        self.print_num = 42 + (num_classes - 3) * 7
        self.print_num_minus = self.print_num - 2
        self.print_num_half = int(self.print_num / 2 - 1)

    def rule(self, ch="-"):
        print(ch * self.print_num)

    def line(self, text):
        print(f"| {text}".ljust(self.print_num_minus, " "), "|")

    def half(self, left, right):
        print(f"| {left}".ljust(self.print_num_half, " "),
              f"| {right}".ljust(self.print_num_half, " "), "|")

    def epoch_header(self, epoch, num_epochs):
        self.rule("=")
        self.line(f"Epoch {epoch + 1}/{num_epochs}")

    def epoch_loss(self, loss, train=True):
        self.rule()
        self.line(f"{'Train' if train else 'Val'} Loss: {loss:.4f}")
        self.rule()

    def eval_list(self, num_classes, eval_list, train=True):
        text = "Train" if train else "Val"
        if num_classes == 2:
            self.line(f"{text} Thr: {eval_list[0]:.4f}")
        self.line(f"{text}  Jc: {eval_list[1]:.4f}")
        self.line(f"{text}  Dc: {eval_list[2]:.4f}")

    def best_val(self, num_classes, best):
        if num_classes == 2:
            self.line(f"Best Val Thr: {best[0]:.4f}")
        self.line(f"Best Val  Jc: {best[1]:.4f}")
        self.line(f"Best Val  Dc: {best[2]:.4f}")


class MetricsLog:
    """Row-append metric log flushed to CSV (train_log.csv / val_log.csv)."""

    def __init__(self, path, filename):
        self.path = os.path.join(path, filename)
        self.rows = []

    def append(self, **row):
        self.rows.append(row)

    def flush(self):
        pd.DataFrame(self.rows).to_csv(self.path, index=False)


def make_tb_writer(logdir):
    """TensorBoard writer if the tensorboard package is present, else a
    no-op stub (keeps trainers dependency-light)."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=logdir)
    except Exception:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def close(self):
                pass

        return _Null()
