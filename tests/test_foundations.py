import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hebbax.config.schedules import warmup_step_lr, warmup_step_schedule
from hebbax.config.ramps import sigmoid_rampup, linear_rampup
from hebbax.ops.losses import (
    dice_loss, cross_entropy_loss, softmax_mse_loss, entropy_loss,
)
from hebbax.ops.metrics import (
    SweepAccumulator, eval_single_class, eval_multi_class, THRESHOLDS,
)
from hebbax.ops.distance import hd95, assd, mask_to_sdf
from hebbax.ops.morphology import remove_small_holes, keep_largest_component


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestSchedule:
    # Values pinned by running the reference GradualWarmupScheduler+StepLR
    # (multiplier=1, warmup 20, StepLR(50, 0.5), base 0.5).
    PINNED = {0: 0.0, 1: 0.025, 10: 0.25, 20: 0.5, 21: 0.5, 70: 0.5,
              71: 0.25, 120: 0.25, 121: 0.125, 171: 0.0625}

    def test_host_lr(self):
        for e, lr in self.PINNED.items():
            assert warmup_step_lr(e, 0.5, 20, 50, 0.5) == pytest.approx(lr)

    def test_optax_schedule(self):
        sched = warmup_step_schedule(0.5, 20, 50, 0.5, steps_per_epoch=3)
        for e, lr in self.PINNED.items():
            assert float(sched(e * 3)) == pytest.approx(lr)
            assert float(sched(e * 3 + 2)) == pytest.approx(lr)


def test_ramps():
    assert sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5.0))
    assert sigmoid_rampup(10, 10) == 1.0
    assert sigmoid_rampup(5, 0) == 1.0
    assert linear_rampup(5, 10) == 0.5
    assert linear_rampup(20, 10) == 1.0


class TestDiceLoss:
    def test_manual_value(self):
        # 1 sample, 2x2 image, 2 classes, hand-computed
        logits = np.zeros((1, 2, 2, 2), np.float32)
        logits[..., 1] = np.log(3.0)  # softmax fg prob = 0.75 everywhere
        target = np.array([[[1, 1], [0, 0]]], np.int32)
        p_fg, p_bg = 0.75, 0.25
        # class 0: num=2*(p_bg*2)+1, den=(4*p_bg^2 + 2)+1
        l0 = 1 - (2 * (2 * p_bg) + 1) / (4 * p_bg ** 2 + 2 + 1)
        l1 = 1 - (2 * (2 * p_fg) + 1) / (4 * p_fg ** 2 + 2 + 1)
        expected = (l0 + l1) / 2
        got = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_perfect_prediction_low_loss(self):
        target = np.random.RandomState(0).randint(0, 2, (2, 8, 8))
        logits = np.stack([(target == 0) * 50.0, (target == 1) * 50.0],
                          axis=-1).astype(np.float32)
        loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
        assert loss < 0.01

    def test_ignore_index(self):
        rs = np.random.RandomState(1)
        logits = rs.randn(2, 4, 4, 2).astype(np.float32)
        target = rs.randint(0, 2, (2, 4, 4)).astype(np.int32)
        target_ig = target.copy()
        target_ig[:, 0, :] = -1
        full = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
        masked = float(dice_loss(jnp.asarray(logits), jnp.asarray(target_ig)))
        assert full != pytest.approx(masked)


def test_cross_entropy_matches_manual():
    rs = np.random.RandomState(2)
    logits = rs.randn(2, 3, 3, 4).astype(np.float32)
    target = rs.randint(0, 4, (2, 3, 3)).astype(np.int32)
    probs = _np_softmax(logits, -1)
    expected = -np.mean(np.log(
        probs.reshape(-1, 4)[np.arange(18), target.reshape(-1)]))
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_softmax_mse_and_entropy():
    rs = np.random.RandomState(3)
    a = rs.randn(2, 4, 4, 2).astype(np.float32)
    b = rs.randn(2, 4, 4, 2).astype(np.float32)
    expected = (_np_softmax(a, -1) - _np_softmax(b, -1)) ** 2
    got = np.asarray(softmax_mse_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-6)

    p = _np_softmax(a, -1)
    expected_ent = np.mean(
        -np.sum(p * np.log(p + 1e-6), axis=-1)) / np.log(2)
    got_ent = float(entropy_loss(jnp.asarray(p), 2))
    assert got_ent == pytest.approx(expected_ent, rel=1e-5)


class TestSweep:
    def _naive(self, logits, target):
        # Direct re-derivation of the reference protocol (utils.py:242-267)
        scores = _np_softmax(logits, -1)[..., 1].flatten()
        t = target.flatten()
        jac = np.zeros(len(THRESHOLDS))
        dic = np.zeros(len(THRESHOLDS))
        for i, thr in enumerate(THRESHOLDS):
            pred = (scores > thr).astype(np.int8)
            s = pred + t
            tp = float(np.sum(s == 2))
            union = np.sum(s == 1)
            jac[i] = tp / float(union + tp)
            dic[i] = 2 * tp / float(union + 2 * tp)
        idx = np.argmax(jac)
        return THRESHOLDS[idx], jac[idx], dic[idx]

    def test_matches_naive(self):
        rs = np.random.RandomState(4)
        logits = rs.randn(6, 16, 16, 2).astype(np.float32)
        target = rs.randint(0, 2, (6, 16, 16)).astype(np.int32)
        expected = self._naive(logits, target)
        got = eval_single_class(logits, target)
        assert got[0] == pytest.approx(expected[0])
        assert got[1] == pytest.approx(expected[1], rel=1e-6)
        assert got[2] == pytest.approx(expected[2], rel=1e-6)

    def test_streaming_equals_oneshot(self):
        rs = np.random.RandomState(5)
        logits = rs.randn(8, 8, 8, 2).astype(np.float32)
        target = rs.randint(0, 2, (8, 8, 8)).astype(np.int32)
        acc = SweepAccumulator()
        for i in range(0, 8, 2):
            acc.update(jnp.asarray(logits[i:i + 2]),
                       jnp.asarray(target[i:i + 2]))
        got = acc.finalize()
        expected = eval_single_class(logits, target)
        assert got == pytest.approx(expected)


def test_multiclass_eval():
    rs = np.random.RandomState(6)
    logits = rs.randn(4, 8, 8, 3).astype(np.float32)
    target = rs.randint(0, 3, (4, 8, 8)).astype(np.int32)
    _, ji, dc = eval_multi_class(logits, target, 3)
    pred = np.argmax(logits, -1).flatten()
    t = target.flatten()
    hist = np.zeros((3, 3))
    for a, b in zip(t, pred):
        hist[a, b] += 1
    diag = np.diag(hist)
    jac = diag / (hist.sum(0) + hist.sum(1) - diag)
    dic = 2 * diag / (hist.sum(0) + hist.sum(1))
    assert ji == pytest.approx(np.nanmean(jac))
    assert dc == pytest.approx(np.nanmean(dic))


class TestDistance:
    def test_identical_masks_zero(self):
        m = np.zeros((16, 16), bool)
        m[4:10, 4:10] = True
        assert hd95(m, m) == 0.0
        assert assd(m, m) == 0.0

    def test_shifted_square(self):
        a = np.zeros((32, 32), bool)
        b = np.zeros((32, 32), bool)
        a[8:16, 8:16] = True
        b[10:18, 8:16] = True  # shift by 2 along axis 0
        assert 0 < assd(a, b) <= 2.0
        assert hd95(a, b) <= 2.0 + 1e-9


def test_sdf_properties():
    m = np.zeros((16, 16), bool)
    m[4:12, 4:12] = True
    sdf = mask_to_sdf(m)
    assert sdf.min() >= -1.0 and sdf.max() <= 1.0
    assert sdf[8, 8] < 0          # inside -> negative
    assert sdf[0, 0] > 0          # outside -> positive
    assert sdf[4, 4] == 0.0       # inner boundary pixel -> zero
    assert np.all(mask_to_sdf(np.zeros((4, 4), bool)) == 0)


def test_morphology():
    m = np.ones((16, 16), np.uint8)
    m[8, 8] = 0                   # small hole
    filled = remove_small_holes(m, 500)
    assert filled[8, 8]
    two = np.zeros((16, 16), np.uint8)
    two[1:3, 1:3] = 1             # 4 px
    two[8:14, 8:14] = 1           # 36 px
    kept = keep_largest_component(two)
    assert kept[10, 10] == 1 and kept[1, 1] == 0


def test_checkpoint_roundtrip(tmp_path):
    from hebbax.utils.checkpoint import save_snapshot, load_snapshot
    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                       "b": np.zeros(3, np.float32)}}
    out = save_snapshot(tree, str(tmp_path), threshold=0.42, save_best=True,
                        hebb_params={"mode": "swta_t", "k": 50},
                        layers_excluded=["out_conv"])
    assert out.endswith("best_JI.ckpt")
    restored, meta = load_snapshot(out)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  tree["params"]["w"])
    assert meta["threshold"] == pytest.approx(0.42)
    assert meta["hebb_params"]["k"] == 50
    assert meta["excluded_layers"] == ["out_conv"]
