"""Epoch harness for single-model training (supervised baselines and the
unsupervised pretrainers).

Mirrors the reference loop contract (/root/reference/train_sup_2d.py:
196-367): per-epoch training with streaming metric accumulation,
display-interval console/TensorBoard/CSV reporting, validation-interval
evaluation with best-val-Jaccard snapshotting, and final last.ckpt +
train_log.csv/val_log.csv artifacts — with the compute expressed as one
donated jitted step and metrics accumulated on device (no epoch-long
logit hoarding; utils.py:242-267 is replaced by the streaming sweep).
"""

import time

import jax
import numpy as np

from ..ops.metrics import make_accumulator
from ..utils import images as image_utils
from ..utils.checkpoint import save_snapshot
from ..utils.logging import BoxPrinter, MetricsLog, make_tb_writer


class SupTrainer:
    """Single-model trainer.

    Parameters
    ----------
    train_step : jitted (state, batch, key) -> (state, {'loss','logits'})
    eval_step : jitted (variables, batch, key) -> {'logits', 'loss'}
    batch_prep : optional host fn(batch dict) -> batch dict (device put /
        sharding, mask retype) applied before each step.
    """

    def __init__(self, *, model, state, train_step, eval_step, loaders,
                 num_classes, paths, args, hebb_meta=None,
                 palette=None, printer=None):
        self.model = model
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        self.loaders = loaders
        self.num_classes = num_classes
        self.paths = paths
        self.args = args
        self.hebb_meta = hebb_meta or {}
        self.palette = palette
        self.printer = printer or BoxPrinter(num_classes)
        self.writer = make_tb_writer(paths.tensorboard)
        self.train_log = MetricsLog(paths.run, "train_log.csv")
        self.val_log = MetricsLog(paths.run, "val_log.csv")
        self.best_val = [0.0, 0.0, 0.0]
        self.best_epoch = -1
        self._sharding = None
        self._n_valid = None

    # -- SPMD data parallelism -------------------------------------------

    def enable_data_parallel(self, n_devices=None):
        """Shard batches over a 'data' mesh and replicate the train state
        (SURVEY.md section 2.6: params replicated, batch sharded; XLA
        inserts the psum all-reduces).  Partial batches are padded by
        repeating the last sample; metrics are masked to the true count."""
        import jax as _jax

        from ..parallel import (batch_sharding, make_mesh, pad_batch_to,
                                replicate_state)
        n = n_devices or len(_jax.devices())
        if n <= 1:
            return self
        mesh = make_mesh(n)
        self._sharding = batch_sharding(mesh)
        self._dp = n
        self.state = replicate_state(self.state, mesh)
        base_prep = self.prep

        def prep(batch):
            b = base_prep(batch)
            sizes = [v.shape[0] for v in b.values()
                     if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0]
            n_valid = sizes[0] if sizes else 0
            total = -(-n_valid // n) * n
            if total != n_valid:
                b = pad_batch_to(
                    {k: (np.asarray(v) if hasattr(v, "shape") else v)
                     for k, v in b.items()}, total)
            # per-sample 0/1 validity: losses mask padded samples out so a
            # padded batch reproduces the unpadded loss/grads exactly
            # (ops/losses.py weighted_mean; mask pixels pad to -1)
            w = np.zeros(total, np.float32)
            w[:n_valid] = 1.0
            b["weight"] = w
            self._n_valid = n_valid
            return {k: (_jax.device_put(v, self._sharding)
                        if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
                        else v) for k, v in b.items()}

        self.prep = prep
        return self

    # -- helpers ---------------------------------------------------------

    def _key(self, epoch, i=0, val=False):
        base = jax.random.PRNGKey(self.args.seed + (1 << 20 if val else 0))
        return jax.random.fold_in(base, epoch * 100003 + i)

    def _save_best(self, threshold, epoch):
        save_snapshot(
            self.state.variables, self.paths.checkpoints,
            threshold=threshold, save_best=True, **self.hebb_meta)
        self.best_epoch = epoch

    def _save_last(self, threshold):
        save_snapshot(
            self.state.variables, self.paths.checkpoints,
            threshold=threshold, save_best=False, **self.hebb_meta)

    # -- main loop -------------------------------------------------------

    def train_epoch(self, epoch, collect_metrics):
        acc = make_accumulator(self.num_classes) if collect_metrics else None
        # loss accumulates on device; one fetch at epoch end (per-batch
        # float() would synchronize the accelerator every step)
        total_loss, n_batches = 0.0, 0
        aux_totals = {}
        last = None
        for i, batch in enumerate(self.loaders["train"]):
            batch = self.prep(batch)
            self.state, out = self.train_step(
                self.state, batch, self._key(epoch, i))
            total_loss = total_loss + out["loss"]
            # auxiliary scalar losses (e.g. loss_unsup / loss_superdiff of
            # the pretrainers — the reference prints these per epoch,
            # pretrain_superdiff_unsup_2d.py:205-207,231)
            for k, v in out.items():
                if k != "loss" and k.startswith("loss") and getattr(
                        v, "ndim", 1) == 0:
                    aux_totals[k] = aux_totals.get(k, 0.0) + v
            n_batches += 1
            if acc is not None:
                nv = self._n_valid
                if nv is not None:
                    acc.update(out["logits"][:nv], batch["mask"][:nv])
                else:
                    acc.update(out["logits"], batch["mask"])
            last = (out, batch)
        n = max(n_batches, 1)
        self._aux_losses = {k: float(v) / n for k, v in aux_totals.items()}
        return float(total_loss) / n, acc, last

    def validate(self, epoch):
        acc = make_accumulator(self.num_classes)
        total_loss, n_batches = 0.0, 0
        preds, names = [], []
        variables = self.state.variables
        for i, batch in enumerate(self.loaders["val"]):
            ids = batch.get("id")
            batch = self.prep(batch)
            out = self.eval_step(variables, batch,
                                 self._key(epoch, i, val=True))
            if "loss" in out:
                total_loss = total_loss + out["loss"]
            n_batches += 1
            nv = self._n_valid
            if nv is not None:
                acc.update(out["logits"][:nv], batch["mask"][:nv])
            else:
                acc.update(out["logits"], batch["mask"])
            if self.args.debug and self.palette is not None:
                probs = jax.nn.softmax(out["logits"], axis=-1)[..., 1]
                preds.append(np.asarray(probs if nv is None
                                        else probs[:nv]))
                names.extend(ids or [])
        thr, ji, dc = acc.finalize()
        val_loss = float(total_loss) / max(n_batches, 1)
        return val_loss, (thr, ji, dc), preds, names

    def prep(self, batch):
        out = dict(batch)
        out.pop("id", None)
        return out

    def run(self):
        args = self.args
        dp = getattr(args, "dp_devices", 1)
        if dp != 1 and self._sharding is None:
            self.enable_data_parallel(dp or None)
        profile_dir = getattr(args, "profile_dir", None)
        since = time.time()
        start_epoch = 0
        if getattr(args, "resume", None):
            import os

            from ..utils.checkpoint import load_train_state
            rp = os.path.join(self.paths.checkpoints, "resume.ckpt")
            if os.path.exists(rp):
                self.state, meta = load_train_state(self.state, rp)
                start_epoch = meta["epoch"] + 1
                if meta.get("best_val"):
                    self.best_val = meta["best_val"]
                self.printer.line(f"Resumed from epoch {start_epoch}")
        for epoch in range(start_epoch, args.num_epochs):
            display = (epoch + 1) % args.display_iter == 0
            validate = ((epoch + 1) % args.validate_iter == 0
                        or epoch + 1 == args.num_epochs)
            epoch_t0 = time.time()
            if profile_dir and epoch == 1:
                # epoch 1: past compilation, representative steady state
                with jax.profiler.trace(profile_dir):
                    train_loss, acc, _ = self.train_epoch(epoch, display)
            else:
                train_loss, acc, _ = self.train_epoch(epoch, display)
            self._epoch_seconds = time.time() - epoch_t0

            if display:
                p = self.printer
                p.epoch_header(epoch, args.num_epochs)
                p.epoch_loss(train_loss, train=True)
                ev = acc.finalize()
                p.eval_list(self.num_classes, ev, train=True)
                losses = getattr(self, "_epoch_losses", None)
                if losses:  # semi trainers: sup/unsup/total sinks
                    self.writer.add_scalar("train/segm_loss",
                                           losses["loss_sup"], epoch + 1)
                    self.writer.add_scalar("train/unsup_loss",
                                           losses["loss_unsup"], epoch + 1)
                    self.writer.add_scalar("train/total_loss",
                                           losses["loss"], epoch + 1)
                else:
                    self.writer.add_scalar("train/segm_loss", train_loss,
                                           epoch + 1)
                self.writer.add_scalar("train/JI", ev[1], epoch + 1)
                self.writer.add_scalar("train/DC", ev[2], epoch + 1)
                aux = getattr(self, "_aux_losses", None) or {}
                for k, v in aux.items():
                    self.writer.add_scalar(f"train/{k}", v, epoch + 1)
                self.train_log.append(epoch=epoch + 1, loss=train_loss,
                                      thresh=ev[0], JI=ev[1], DC=ev[2],
                                      seconds=round(self._epoch_seconds, 3),
                                      **aux)

            if validate:
                val_loss, ev, preds, names = self.validate(epoch)
                p = self.printer
                p.epoch_loss(val_loss, train=False)
                p.eval_list(self.num_classes, ev, train=False)
                self.writer.add_scalar("val/segm_loss", val_loss, epoch + 1)
                self.writer.add_scalar("val/JI", ev[1], epoch + 1)
                self.writer.add_scalar("val/DC", ev[2], epoch + 1)
                self.val_log.append(epoch=epoch + 1, loss=val_loss,
                                    thresh=ev[0] if ev[0] else 0.0,
                                    JI=ev[1], DC=ev[2])
                if ev[1] > self.best_val[1]:
                    self.best_val = list(ev)
                    self._save_best(ev[0], epoch)
                    if args.debug and preds and self.palette is not None:
                        image_utils.save_preds(
                            np.concatenate(preds), ev[0], names,
                            self.paths.val_seg_preds, self.palette)
                if getattr(args, "resume", None):
                    from ..utils.checkpoint import save_train_state
                    save_train_state(self.state, self.paths.checkpoints,
                                     epoch, self.best_val)

        self._save_last(self.best_val[0])
        self.train_log.flush()
        self.val_log.flush()
        self.printer.rule("=")
        self.printer.best_val(self.num_classes, self.best_val)
        elapsed = time.time() - since
        self.printer.line(
            f"Training done in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")
        self.printer.rule("=")
        self.writer.close()
        return self.best_val
