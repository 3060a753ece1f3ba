"""Semi-supervised training: step factories + epoch harnesses.

Replaces the reference's per-algorithm copy-pasted ~450-line loops
(train_semi_{EM,UAMT,CPS,URPC,CCT}_2d.py) with one jitted step per
algorithm built from shared combinators.  The reference's two-phase
backward (unsup.backward(retain_graph=True); sup.backward(); step()) is
mathematically a single step on sup + w*unsup (pseudo-labels/teachers are
detached), so each step computes that total loss once.

Loss formulas (cited per algorithm in the factory docstrings) are exact
replications; the linear unsup ramp w*(epoch+1)/E
(train_semi_CPS_2d.py:244) is applied by the harness.
"""

from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.registry import primary_logits
from ..ops.losses import entropy_loss, softmax_mse_loss, weighted_mean
from .loop import SupTrainer
from .state import TrainState
from .steps import _model_rngs


# ---------------------------------------------------------------------------
# Single-model algorithms: EM, URPC, CCT
# ---------------------------------------------------------------------------

def make_semi_step(model, network: str, criterion, tx,
                   unsup_fn: Callable, sup_fn: Callable = None):
    """Generic single-state semi step.

    unsup_fn(outputs_unsup, unsup_batch) -> scalar consistency/entropy
    objective (the batch carries the optional dp per-sample 'weight').
    sup_fn(outputs_sup, sup_batch) -> scalar supervised loss (defaults to
    criterion on the primary output vs batch['mask']).
    """
    if sup_fn is None:
        def sup_fn(outputs, batch):
            return criterion(primary_logits(network, outputs),
                             batch["mask"])

    def step(state: TrainState, sup_batch, unsup_batch, unsup_weight, key):
        k_unsup, k_sup = jax.random.split(key)

        def loss_of(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            # unsup forward first, sup second — BN running-stat update
            # order mirrors the reference loop (train_semi_EM_2d.py:215-263)
            out_u, mut = model.apply(
                variables, unsup_batch["image"], train=True,
                rngs=_model_rngs(k_unsup), mutable=["batch_stats"])
            variables2 = {"params": params, **mut}
            out_s, mut = model.apply(
                variables2, sup_batch["image"], train=True,
                rngs=_model_rngs(k_sup), mutable=["batch_stats"])
            loss_u = unsup_fn(out_u, unsup_batch) * unsup_weight
            loss_s = sup_fn(out_s, sup_batch)
            return loss_s + loss_u, (out_s, mut, loss_s, loss_u)

        (_, (out_s, mut, loss_s, loss_u)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, batch_stats=mut.get("batch_stats"),
            opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss_s + loss_u, "loss_sup": loss_s,
                           "loss_unsup": loss_u,
                           "logits": primary_logits(network, out_s)}

    return jax.jit(step, donate_argnums=(0,))


def em_unsup(num_classes):
    """Entropy minimization (train_semi_EM_2d.py:229-235)."""

    def fn(outputs, batch):
        probs = jax.nn.softmax(outputs, axis=-1)
        return entropy_loss(probs, num_classes, weight=batch.get("weight"))

    return fn


def urpc_unsup(outputs, batch):
    """Uncertainty-rectified pyramid consistency
    (train_semi_URPC_2d.py:233-259): mean softmax across 4 scales;
    per-scale KL-to-mean variance weighting exp(-KL)."""
    w = batch.get("weight")
    ps = [jax.nn.softmax(o, axis=-1) for o in outputs]
    mean_p = sum(ps) / len(ps)
    log_mean = jnp.log(mean_p)
    total = 0.0
    for p in ps:
        # torch KLDivLoss(log_mean, p) = p*(log p - log_mean), summed over C
        var = jnp.sum(p * (jnp.log(p + 1e-8) - log_mean), axis=-1,
                      keepdims=True)
        exp_var = jnp.exp(-var)
        dist = (mean_p - p) ** 2
        total = total + (weighted_mean(dist * exp_var, w)
                         / (weighted_mean(exp_var, w) + 1e-8)
                         + weighted_mean(var, w))
    return total / len(ps)


def cct_unsup(outputs, batch):
    """Cross-consistency: MSE between main and each perturbed-aux softmax
    (train_semi_CCT_2d.py:233-244)."""
    w = batch.get("weight")
    main = jax.nn.softmax(outputs[0], axis=-1)
    total = 0.0
    for aux in outputs[1:]:
        total = total + weighted_mean(
            (main - jax.nn.softmax(aux, axis=-1)) ** 2, w)
    return total / (len(outputs) - 1)


def deep4_sup(criterion):
    """Average criterion over 4 heads (train_semi_CCT_2d.py:258,
    train_semi_URPC_2d.py sup block)."""

    def fn(outputs, batch):
        mask = batch["mask"]
        return sum(criterion(o, mask) for o in outputs) / len(outputs)

    return fn


def dtc_unsup(outputs, batch):
    """Dual-task consistency (train_semi_DTC_3d.py:254-259):
    MSE(sigmoid(-1500*sdf), sigmoid(seg))."""
    sdf, seg = outputs
    return weighted_mean((jax.nn.sigmoid(-1500.0 * sdf)
                          - jax.nn.sigmoid(seg)) ** 2,
                         batch.get("weight"))


def dtc_sup(criterion, beta: float = 0.3, num_classes: int = 2):
    """DTC supervised loss (train_semi_DTC_3d.py:288-294):
    dice(seg) + beta * MSE(sdf channel c, gt sdf_c)."""

    def fn(outputs, batch):
        sdf, seg = outputs
        w = batch.get("weight")
        loss_sdf = weighted_mean((sdf[..., 1] - batch["mask_sdf"]) ** 2, w)
        if num_classes == 3 and "mask_sdf2" in batch:
            loss_sdf = loss_sdf + weighted_mean(
                (sdf[..., 2] - batch["mask_sdf2"]) ** 2, w)
        return criterion(seg, batch["mask"]) + beta * loss_sdf

    return fn


# ---------------------------------------------------------------------------
# Dual-model state (UAMT teacher / CPS second net)
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class DualState:
    params1: any
    batch_stats1: any
    opt_state1: any
    params2: any
    batch_stats2: any
    opt_state2: any = None  # None for UAMT (teacher has no optimizer)
    step: int = 0

    def variables(self, which: int):
        p = self.params1 if which == 1 else self.params2
        b = self.batch_stats1 if which == 1 else self.batch_stats2
        v = {"params": p}
        if b is not None:
            v["batch_stats"] = b
        return v


def make_uamt_step(model, network: str, criterion, tx, num_classes: int,
                   num_epochs: int, ema_decay: float = 0.99, mc_T: int = 8):
    """Uncertainty-aware mean teacher (train_semi_UAMT_2d.py:243-305).

    Student forward on clean unsup batch; teacher forward on noised batch
    (noise = clamp(0.1*N(0,1), +-0.2)); uncertainty = entropy of the mean
    of T=8 noised teacher softmaxes; consistency = softmax MSE masked by
    uncertainty < (0.75+0.25*sigmoid_rampup(epoch/E))*ln(2); EMA update
    with alpha = min(1-1/(epoch+1), decay) after the optimizer step."""

    def step(state: DualState, sup_batch, unsup_batch, unsup_weight,
             epoch, key):
        k_noise, k_mc, k_s, k_u, k_t = jax.random.split(key, 5)
        img_u = unsup_batch["image"]
        noise = jnp.clip(
            0.1 * jax.random.normal(k_noise, img_u.shape), -0.2, 0.2)
        img_u2 = img_u + noise

        # teacher consistency forward (train mode; running stats update)
        t_out, t_mut = model.apply(
            state.variables(2), img_u2, train=True,
            rngs=_model_rngs(k_t), mutable=["batch_stats"])
        t_logits = jax.lax.stop_gradient(primary_logits(network, t_out))

        # T-sample MC uncertainty: scan to mirror the sequential
        # running-stat updates of the reference's no_grad loop
        def mc_body(carry_bs, k):
            noise_i = jnp.clip(
                0.1 * jax.random.normal(k, img_u.shape), -0.2, 0.2)
            v = {"params": state.params2}
            if carry_bs is not None:
                v["batch_stats"] = carry_bs
            out, mut = model.apply(v, img_u + noise_i, train=True,
                                   rngs=_model_rngs(k),
                                   mutable=["batch_stats"])
            probs = jax.nn.softmax(primary_logits(network, out), axis=-1)
            return mut.get("batch_stats"), probs

        bs2, mc_probs = jax.lax.scan(
            mc_body, t_mut.get("batch_stats"), jax.random.split(k_mc, mc_T))
        mean_probs = jnp.mean(mc_probs, axis=0)
        uncertainty = -jnp.sum(
            mean_probs * jnp.log(mean_probs + 1e-6), axis=-1, keepdims=True)
        phase = jnp.clip(epoch / num_epochs, 0.0, 1.0)
        rampup = jnp.exp(-5.0 * (1.0 - phase) ** 2)
        thresh = (0.75 + 0.25 * rampup) * jnp.log(2.0)
        unc_mask = (uncertainty < thresh).astype(jnp.float32)
        w = unsup_batch.get("weight")
        if w is not None:  # dp padding: padded samples drop out of both
            unc_mask = unc_mask * w.reshape(  # numerator and denominator
                (-1,) + (1,) * (unc_mask.ndim - 1))
        unc_mask = jax.lax.stop_gradient(unc_mask)

        def loss_of(params):
            v = {"params": params}
            if state.batch_stats1 is not None:
                v["batch_stats"] = state.batch_stats1
            s_out_u, mut = model.apply(v, img_u, train=True,
                                       rngs=_model_rngs(k_u),
                                       mutable=["batch_stats"])
            s_logits_u = primary_logits(network, s_out_u)
            v2 = {"params": params, **mut}
            s_out, mut = model.apply(v2, sup_batch["image"], train=True,
                                     rngs=_model_rngs(k_s),
                                     mutable=["batch_stats"])
            cons = softmax_mse_loss(s_logits_u, t_logits)
            loss_u = (jnp.sum(unc_mask * cons)
                      / (2 * jnp.sum(unc_mask) + 1e-16)) * unsup_weight
            logits_s = primary_logits(network, s_out)
            loss_s = criterion(logits_s, sup_batch["mask"])
            return loss_s + loss_u, (logits_s, mut, loss_s, loss_u)

        (_, (logits_s, mut, loss_s, loss_u)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params1)
        updates, opt1 = tx.update(grads, state.opt_state1, state.params1)
        params1 = optax.apply_updates(state.params1, updates)
        # EMA teacher update (utils.py:557-561), alpha from the epoch index
        alpha = jnp.minimum(1.0 - 1.0 / (epoch + 1.0), ema_decay)
        params2 = jax.tree_util.tree_map(
            lambda e, p: alpha * e + (1.0 - alpha) * p,
            state.params2, params1)
        new_state = state.replace(
            params1=params1, batch_stats1=mut.get("batch_stats"),
            opt_state1=opt1, params2=params2, batch_stats2=bs2,
            step=state.step + 1)
        return new_state, {"loss": loss_s + loss_u, "loss_sup": loss_s,
                           "loss_unsup": loss_u, "logits": logits_s}

    return jax.jit(step, donate_argnums=(0,))


def make_cps_step(model1, model2, network: str, criterion, tx1, tx2):
    """Cross pseudo supervision (train_semi_CPS_2d.py:253-299): each net
    supervised by the argmax pseudo-label of the other on unlabeled data;
    both also supervised on the labeled batch; two optimizers."""

    def step(state: DualState, sup_batch, unsup_batch, unsup_weight, key):
        k1u, k1s, k2u, k2s = jax.random.split(key, 4)

        def loss_of(both):
            p1, p2 = both
            v1 = {"params": p1}
            if state.batch_stats1 is not None:
                v1["batch_stats"] = state.batch_stats1
            v2 = {"params": p2}
            if state.batch_stats2 is not None:
                v2["batch_stats"] = state.batch_stats2
            out1u, mut1 = model1.apply(v1, unsup_batch["image"], train=True,
                                       rngs=_model_rngs(k1u),
                                       mutable=["batch_stats"])
            out2u, mut2 = model2.apply(v2, unsup_batch["image"], train=True,
                                       rngs=_model_rngs(k2u),
                                       mutable=["batch_stats"])
            l1u = primary_logits(network, out1u)
            l2u = primary_logits(network, out2u)
            pl1 = jax.lax.stop_gradient(jnp.argmax(l1u, axis=-1))
            pl2 = jax.lax.stop_gradient(jnp.argmax(l2u, axis=-1))
            w = unsup_batch.get("weight")
            if w is not None:  # dp padding: padded pseudo-labels -> ignore
                wb = (w.reshape((-1,) + (1,) * (pl1.ndim - 1)) > 0)
                pl1 = jnp.where(wb, pl1, -1)
                pl2 = jnp.where(wb, pl2, -1)
            loss_u = (criterion(l1u, pl2) + criterion(l2u, pl1)) \
                * unsup_weight
            v1 = {"params": p1, **mut1}
            v2 = {"params": p2, **mut2}
            out1s, mut1 = model1.apply(v1, sup_batch["image"], train=True,
                                       rngs=_model_rngs(k1s),
                                       mutable=["batch_stats"])
            out2s, mut2 = model2.apply(v2, sup_batch["image"], train=True,
                                       rngs=_model_rngs(k2s),
                                       mutable=["batch_stats"])
            l1s = primary_logits(network, out1s)
            l2s = primary_logits(network, out2s)
            loss_s = (criterion(l1s, sup_batch["mask"])
                      + criterion(l2s, sup_batch["mask"]))
            return loss_s + loss_u, (l1s, l2s, mut1, mut2, loss_s, loss_u)

        (_, (l1s, l2s, mut1, mut2, loss_s, loss_u)), grads = \
            jax.value_and_grad(loss_of, has_aux=True)(
                (state.params1, state.params2))
        g1, g2 = grads
        up1, opt1 = tx1.update(g1, state.opt_state1, state.params1)
        up2, opt2 = tx2.update(g2, state.opt_state2, state.params2)
        new_state = state.replace(
            params1=optax.apply_updates(state.params1, up1),
            params2=optax.apply_updates(state.params2, up2),
            batch_stats1=mut1.get("batch_stats"),
            batch_stats2=mut2.get("batch_stats"),
            opt_state1=opt1, opt_state2=opt2, step=state.step + 1)
        return new_state, {"loss": loss_s + loss_u, "loss_sup": loss_s,
                           "loss_unsup": loss_u, "logits": l1s,
                           "logits2": l2s}

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Harnesses
# ---------------------------------------------------------------------------

class SemiTrainer(SupTrainer):
    """Single-model semi harness: per-step (sup, unsup) batch pairs with
    the linear unsup-weight ramp; logging gains unsup/total loss."""

    def __init__(self, *, unsup_weight, **kw):
        super().__init__(**kw)
        self.unsup_weight = unsup_weight

    def epoch_weight(self, epoch):
        return self.unsup_weight * (epoch + 1) / self.args.num_epochs

    def _unsup_iter(self):
        while True:
            for b in self.loaders["train_unsup"]:
                yield b

    def train_epoch(self, epoch, collect_metrics):
        from ..ops.metrics import make_accumulator
        acc = make_accumulator(self.num_classes) if collect_metrics else None
        totals = {"loss": 0.0, "loss_sup": 0.0, "loss_unsup": 0.0}
        n = 0
        w = self.epoch_weight(epoch)
        unsup_it = getattr(self, "_unsup_gen", None)
        if unsup_it is None:
            unsup_it = self._unsup_gen = self._unsup_iter()
        for i, sup_batch in enumerate(self.loaders["train_sup"]):
            unsup_batch = next(unsup_it)
            unsup_b = self.prep(unsup_batch)
            sup_b = self.prep(sup_batch)  # last: _n_valid tracks sup batch
            nv = self._n_valid
            self.state, out = self.call_step(
                sup_b, unsup_b, w, epoch, self._key(epoch, i))
            for k in totals:
                totals[k] = totals[k] + out[k]  # device accumulation
            n += 1
            if acc is not None:
                if nv is not None:
                    acc.update(out["logits"][:nv], sup_b["mask"][:nv])
                else:
                    acc.update(out["logits"], sup_b["mask"])
        n = max(n, 1)
        self._epoch_losses = {k: float(v) / n for k, v in totals.items()}
        return self._epoch_losses["loss"], acc, None

    def call_step(self, sup_b, unsup_b, w, epoch, key):
        return self.train_step(self.state, sup_b, unsup_b,
                               jnp.float32(w), key)


class UAMTTrainer(SemiTrainer):
    def call_step(self, sup_b, unsup_b, w, epoch, key):
        return self.train_step(self.state, sup_b, unsup_b,
                               jnp.float32(w), jnp.float32(epoch), key)


class DualEvalMixin:
    """Validation over both members of a DualState, winner snapshotting
    (train_semi_CPS_2d.py:398-419)."""

    def validate(self, epoch):
        from ..ops.metrics import make_accumulator
        accs = [make_accumulator(self.num_classes),
                make_accumulator(self.num_classes)]
        losses = [0.0, 0.0]
        n_batches = 0
        for i, batch in enumerate(self.loaders["val"]):
            b = self.prep(batch)
            for which in (1, 2):
                out = self.eval_step(self.state.variables(which), b,
                                     self._key(epoch, i, val=True))
                accs[which - 1].update(out["logits"], b["mask"])
                if "loss" in out:
                    losses[which - 1] = losses[which - 1] + out["loss"]
            n_batches += 1
        ev1 = accs[0].finalize()
        ev2 = accs[1].finalize()
        self._last_dual_eval = (ev1, ev2)
        ev = ev2 if ev2[1] > ev1[1] else ev1
        self._winner = 2 if ev2[1] > ev1[1] else 1
        # the reference logs BOTH members' val losses
        # (train_semi_CPS_2d.py:398 compute_val_epoch_loss_MT)
        l1 = float(losses[0]) / max(n_batches, 1)
        l2 = float(losses[1]) / max(n_batches, 1)
        self.printer.line(f"Val Loss 2: {l2:.4f}")
        self.writer.add_scalar("val/segm_loss2", l2, epoch + 1)
        return l1, ev, [], []

    def _save_best(self, threshold, epoch):
        from ..utils.checkpoint import save_snapshot
        save_snapshot(self.state.variables(self._winner),
                      self.paths.checkpoints, threshold=threshold,
                      save_best=True, **self.hebb_meta)
        self.best_epoch = epoch

    def _save_last(self, threshold):
        from ..utils.checkpoint import save_snapshot
        import os
        save_snapshot(self.state.variables(1), self.paths.checkpoints,
                      threshold=threshold, save_best=False,
                      **self.hebb_meta)
        # second model's last snapshot in checkpoints2 (CPS_2d.py:452-453)
        save_snapshot(self.state.variables(2),
                      self.paths.checkpoints + "2", threshold=threshold,
                      save_best=False, **self.hebb_meta)


class CPSTrainer(DualEvalMixin, SemiTrainer):
    pass


class UAMTDualTrainer(DualEvalMixin, UAMTTrainer):
    pass
