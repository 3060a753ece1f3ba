"""Streaming evaluation metrics.

The reference hoards every batch's logits for a whole epoch on device, pulls
them to numpy, and sweeps 45 thresholds over the flattened pixel array
(/root/reference/utils.py:242-288).  TPU-native redesign: per-batch
O(T)-counter accumulation on device (threshold sweep as a broadcasted
compare + reduce), O(1) memory in epoch length, no device->host transfer
until the final argmax.  The produced (threshold, jaccard, dice) triple is
bit-identical in exact arithmetic to the reference protocol.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Fixed sweep grid: np.arange(0, 0.9, 0.02) -> 45 thresholds
THR_RANGE = (0.0, 0.9)
THR_INTERVAL = 0.02
THRESHOLDS = np.arange(THR_RANGE[0], THR_RANGE[1], THR_INTERVAL)


@functools.partial(jax.jit, static_argnames=())
def _sweep_counts(probs_fg, target):
    """Per-threshold (tp, union) counts for one batch.

    union counts pixels where exactly one of (pred, true) is 1 — the
    symmetric difference, matching ``np.sum(sum_area == 1)``.
    """
    thr = jnp.asarray(THRESHOLDS, dtype=probs_fg.dtype).reshape(-1, 1)
    p = probs_fg.reshape(1, -1)
    t = target.reshape(1, -1).astype(probs_fg.dtype)
    pred = (p > thr).astype(probs_fg.dtype)
    tp = jnp.sum(pred * t, axis=1)
    union = jnp.sum(jnp.abs(pred - t), axis=1)
    return tp, union


class SweepAccumulator:
    """Accumulates per-threshold TP/union counters batch by batch.

    Feed binary-task logits (N, ..., 2) channels-last; finalize() returns
    (best_threshold, jaccard, dice) with the argmax-Jaccard selection rule.

    Counters stay ON DEVICE across updates (lazy jnp accumulation) — the
    single host transfer happens at finalize(), so per-batch metric
    updates never synchronize the accelerator.
    """

    def __init__(self):
        self.tp = jnp.zeros(len(THRESHOLDS), jnp.float32)
        self.union = jnp.zeros(len(THRESHOLDS), jnp.float32)

    def update(self, logits, target):
        probs = jax.nn.softmax(logits, axis=-1)[..., 1]
        tp, union = _sweep_counts(probs, target)
        self.tp = self.tp + tp
        self.union = self.union + union
        return self

    def update_probs(self, probs_fg, target):
        tp, union = _sweep_counts(jnp.asarray(probs_fg), jnp.asarray(target))
        self.tp = self.tp + tp
        self.union = self.union + union
        return self

    def finalize(self):
        tp = np.asarray(self.tp, np.float64)
        union = np.asarray(self.union, np.float64)
        # 0/0 (empty mask + empty preds) degrades to 0.0 rather than the
        # reference's ZeroDivisionError (utils.py:260).
        with np.errstate(invalid="ignore", divide="ignore"):
            jaccard = np.nan_to_num(tp / (union + tp))
            dice = np.nan_to_num(2 * tp / (union + 2 * tp))
        idx = int(np.argmax(jaccard))
        return float(THRESHOLDS[idx]), float(jaccard[idx]), float(dice[idx])


@jax.jit
def _confusion_counts(pred, target, num_classes_arr):
    num_classes = num_classes_arr.shape[0]
    idx = target * num_classes + pred
    return jnp.bincount(idx.reshape(-1), length=num_classes * num_classes)


class ConfusionAccumulator:
    """Multi-class confusion-matrix accumulation (argmax predictions)."""

    def __init__(self, num_classes):
        self.num_classes = num_classes
        self.hist = jnp.zeros(num_classes * num_classes, jnp.float32)

    def update(self, logits, target):
        pred = jnp.argmax(logits, axis=-1)
        counts = _confusion_counts(pred.astype(jnp.int32),
                                   jnp.asarray(target, jnp.int32),
                                   jnp.zeros((self.num_classes,)))
        self.hist = self.hist + counts
        return self

    def finalize(self):
        hist = np.asarray(self.hist, np.float64).reshape(
            self.num_classes, self.num_classes)
        diag = np.diag(hist)
        s0 = hist.sum(axis=0)
        s1 = hist.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            jaccard = diag / (s1 + s0 - diag)
            dice = 2 * diag / (s1 + s0)
        return None, float(np.nanmean(jaccard)), float(np.nanmean(dice))


def eval_single_class(logits, target):
    """One-shot binary evaluation of a full array (reference eval parity)."""
    return SweepAccumulator().update(jnp.asarray(logits),
                                     jnp.asarray(target)).finalize()


def eval_multi_class(logits, target, num_classes=None):
    if num_classes is None:
        num_classes = logits.shape[-1]
    return ConfusionAccumulator(num_classes).update(
        jnp.asarray(logits), jnp.asarray(target)).finalize()


def evaluate(num_classes, logits, target):
    """(threshold|None, jaccard, dice) under the reference protocol."""
    if num_classes == 2:
        return eval_single_class(logits, target)
    return eval_multi_class(logits, target, num_classes)


def make_accumulator(num_classes):
    if num_classes == 2:
        return SweepAccumulator()
    return ConfusionAccumulator(num_classes)
