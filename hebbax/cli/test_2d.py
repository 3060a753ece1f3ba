"""2D test-set evaluation (reference: /root/reference/test_2d.py).

Loads best_JI/last snapshot from <path_exp>/checkpoints, reuses the
stored threshold (test_2d.py:110), computes Dice/Jaccard at that
threshold plus HD95/ASSD, saves paletted PNG predictions, and writes
test.csv with the reference's column names (test_2d.py:158-165).
"""

import argparse
import os
import time

import jax
import numpy as np

from ..config.datasets import dataset_cfg, input_stats
from ..data import Loader, SegDataset2D
from ..engine.steps import make_eval_step
from ..hebb.spec import HebbSpec
from ..models import get_network, network_meta
from ..ops.distance import evaluate_distance_binary
from ..ops.metrics import THR_INTERVAL
from ..utils.checkpoint import load_snapshot
from ..utils.images import save_preds
from ..utils.logging import BoxPrinter
from ..utils.seeding import init_seeds


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=0, type=int)
    p.add_argument("--path_dataset", default="data/GlaS")
    p.add_argument("--dataset_name", default="GlaS")
    p.add_argument("--input1", default="image")
    p.add_argument("--path_exp", required=True)
    p.add_argument("--best", default="JI", help="JI | last")
    p.add_argument("--threshold", default=None, type=float)
    p.add_argument("--thr_interval", default=THR_INTERVAL, type=float)
    p.add_argument("-b", "--batch_size", default=2, type=int)
    p.add_argument("--if_mask", default=True)
    p.add_argument("-n", "--network", default="unet_s2d", type=str)  # s2d: exact-parity TPU fast path (tests/test_s2d.py); reference default: unet
    p.add_argument("--hebbian_pretrain", default=None)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    return p


def evaluate_test(probs_fg, masks, threshold, num_classes=2):
    """Pixel metrics at the stored threshold (binary) or via argmax
    confusion (multiclass)."""
    if num_classes == 2:
        pred = (probs_fg > threshold).astype(np.uint8)
        t = masks.astype(np.uint8)
        tp = float(np.sum(pred * t))
        union = float(np.sum(np.abs(pred.astype(np.int64)
                                    - t.astype(np.int64))))
        ji = tp / (union + tp) if union + tp else 0.0
        dc = 2 * tp / (union + 2 * tp) if union + 2 * tp else 0.0
        return threshold, ji, dc
    # multiclass: argmax confusion (utils.py:270-288); probs_fg is then the
    # class map produced by the caller
    pred = probs_fg.astype(np.int64).ravel()
    t = masks.astype(np.int64).ravel()
    hist = np.bincount(t * num_classes + pred,
                       minlength=num_classes ** 2).reshape(num_classes,
                                                           num_classes)
    diag = np.diag(hist).astype(float)
    s0, s1 = hist.sum(axis=0), hist.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ji = float(np.nanmean(diag / (s1 + s0 - diag)))
        dc = float(np.nanmean(2 * diag / (s1 + s0)))
    return None, ji, dc


def run_test(args):
    cfg = dataset_cfg(args.dataset_name)
    init_seeds(args.seed)
    printer = BoxPrinter(cfg["NUM_CLASSES"])

    name = "last" if args.best == "last" else f"best_{args.best}"
    path_snapshot = os.path.join(args.path_exp, "checkpoints",
                                 f"{name}.ckpt")
    variables, meta = load_snapshot(path_snapshot)
    threshold = (meta.get("threshold")
                 if args.threshold is None else args.threshold)

    hebb = None
    if args.hebbian_pretrain and meta.get("hebb_params"):
        hebb = HebbSpec.from_dict(
            meta["hebb_params"],
            exclude=meta.get("excluded_layers") or ())
    elif meta.get("hebb_params") and not args.hebbian_pretrain:
        print("WARNING: snapshot carries hebb_params but "
              "--hebbian_pretrain is not set; the weight-normalized "
              "forward will NOT be applied and metrics will be wrong "
              "(same footgun as the reference's test_2d.py:105-108)")
    model = get_network(args.network, cfg["IN_CHANNELS"],
                        cfg["NUM_CLASSES"], hebb=hebb)
    needs_rng = bool(network_meta(args.network)["rngs"])
    eval_step = make_eval_step(model, args.network, None,
                               needs_rng=needs_rng)

    mean, std = input_stats(cfg, args.input1)
    ds = SegDataset2D(os.path.join(args.path_dataset, "val"), args.input1,
                      mean, std, split="test", sup=bool(args.if_mask))
    loader = Loader(ds, args.batch_size, shuffle=False,
                    num_workers=args.num_workers)

    path_seg_results = os.path.join(args.path_exp, "test_seg_preds")
    os.makedirs(path_seg_results, exist_ok=True)

    since = time.time()
    probs_all, masks_all, names_all = [], [], []
    key = jax.random.PRNGKey(args.seed)
    for i, batch in enumerate(loader):
        b = {"image": np.asarray(batch["image"])}
        out = eval_step(variables, b, jax.random.fold_in(key, i))
        probs = np.asarray(jax.nn.softmax(out["logits"], axis=-1)[..., 1])
        probs_all.append(probs)
        names_all.extend(batch["id"])
        if args.if_mask:
            masks_all.append(batch["mask"])
        else:
            save_preds(probs, threshold, batch["id"], path_seg_results,
                       cfg["PALETTE"])

    metrics = None
    if args.if_mask:
        probs = np.concatenate(probs_all)
        masks = np.concatenate(masks_all)
        pixel = evaluate_test(probs, masks, threshold, cfg["NUM_CLASSES"])
        dist = evaluate_distance_binary(probs, masks, [threshold])
        save_preds(probs, threshold, names_all, path_seg_results,
                   cfg["PALETTE"])
        import pandas as pd
        metrics = {
            "segm/dice": pixel[2],
            "segm/jaccard": pixel[1],
            "segm/asd": dist[1],
            "segm/95hd": dist[0],
            "thresh": pixel[0],
        }
        pd.DataFrame([metrics]).to_csv(
            os.path.join(args.path_exp, "test.csv"), index=False)
        printer.rule("=")
        printer.line(f"Test  Dc: {pixel[2]:.4f}  Jc: {pixel[1]:.4f} "
                     f"HD95: {dist[0]:.2f} ASSD: {dist[1]:.2f}")
    elapsed = time.time() - since
    printer.line(f"Testing completed in {elapsed:.1f}s")
    printer.rule("=")
    return metrics


def main(argv=None):
    args = build_parser().parse_args(argv)
    return run_test(args)


if __name__ == "__main__":
    main()
