"""3D test-set evaluation with sliding-window inference
(reference: /root/reference/test_3d.py).

Per val volume: grid-sample patches, jitted batched forward,
overlap-average aggregation, threshold -> uint8 -> NRRD (affine
preserved); optional hole-fill + largest-component postprocess; offline
pooled-pixel + per-volume distance eval -> test.csv.
"""

import argparse
import os
import time

import jax
import numpy as np

from ..config.datasets import dataset_cfg
from ..data.nrrd_io import read_nrrd, write_nrrd
from ..data.volumes3d import VolumeDataset3D
from ..engine.sliding import slide_window_inference_device
from ..hebb.spec import HebbSpec
from ..models import get_network, primary_logits
from ..ops.distance import eval_distance_offline
from ..ops.morphology import postprocess_3d_pred
from ..utils.checkpoint import load_snapshot
from ..utils.logging import BoxPrinter
from ..utils.seeding import init_seeds


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=0, type=int)
    p.add_argument("--path_exp", required=True)
    p.add_argument("--best", default="JI", type=str)
    p.add_argument("--path_dataset", default="data/Atrial")
    p.add_argument("--dataset_name", default="Atrial")
    p.add_argument("--input1", default="image")
    p.add_argument("--threshold", default=None, type=float)
    p.add_argument("--thr_interval", default=0.02, type=float)
    p.add_argument("--patch_size", default=(112, 112, 32))
    p.add_argument("--patch_overlap", default=(56, 56, 16))
    p.add_argument("-b", "--batch_size", default=8, type=int,
               help="slider patch batch; 8 aligns the TPU "
                    "sublane tile (measured 1.5x vs 4)")
    p.add_argument("-n", "--network", default="unet3d_s2d")  # s2d: exact-parity TPU fast path; reference default: unet3d
    p.add_argument("--hebbian_pretrain", default=False)
    p.add_argument("--fill_hole_thr", default=500, type=int)
    p.add_argument("--postprocessing", default=False)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--dp_devices", default=1, type=int,
                   help="shard patch batches over N devices (0 = all); "
                        "the TPU-native replacement for the reference's "
                        "NCCL DDP tester (test_DTC.py:51,91)")
    return p


def _parse_tuple(v):
    if isinstance(v, str):
        return tuple(int(x) for x in v.strip("()").split(","))
    return tuple(v)


def offline_eval(pred_path, mask_path, num_classes=2):
    """Pooled pixel confusion + per-volume distance metrics
    (utils.py:520-554)."""
    preds, masks = [], []
    for name in sorted(os.listdir(pred_path)):
        pred, _ = read_nrrd(os.path.join(pred_path, name))
        mask, _ = read_nrrd(os.path.join(mask_path, name))
        mask = mask.astype(np.int64)
        mask[mask == 255] = 1
        preds.append(pred.astype(np.int64))
        masks.append(mask)
    p = np.concatenate([x.ravel() for x in preds])
    m = np.concatenate([x.ravel() for x in masks])
    hist = np.zeros((num_classes, num_classes), np.float64)
    idx = m * num_classes + p
    hist += np.bincount(idx, minlength=num_classes ** 2).reshape(
        num_classes, num_classes)
    diag = np.diag(hist)
    s0, s1 = hist.sum(axis=0), hist.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaccard = diag / (s1 + s0 - diag)
        dice = 2 * diag / (s1 + s0)
    if num_classes == 2:
        ji, dc = float(jaccard[1]), float(dice[1])
    else:
        ji, dc = float(np.nanmean(jaccard)), float(np.nanmean(dice))
    hd, sd = eval_distance_offline(masks, preds, num_classes)
    return {"jaccard": ji, "dice": dc, "hd": hd, "sd": sd}


def run_test(args):
    cfg = dataset_cfg(args.dataset_name)
    init_seeds(args.seed)
    printer = BoxPrinter(cfg["NUM_CLASSES"])
    patch_size = _parse_tuple(args.patch_size)
    overlap = _parse_tuple(args.patch_overlap)

    name = "last" if args.best == "last" else f"best_{args.best}"
    variables, meta = load_snapshot(
        os.path.join(args.path_exp, "checkpoints", f"{name}.ckpt"))
    threshold = (meta.get("threshold")
                 if args.threshold is None else args.threshold)

    hebb = None
    if args.hebbian_pretrain and meta.get("hebb_params"):
        hebb = HebbSpec.from_dict(meta["hebb_params"],
                                  exclude=meta.get("excluded_layers") or ())
    elif meta.get("hebb_params") and not args.hebbian_pretrain:
        print("WARNING: snapshot carries hebb_params but "
              "--hebbian_pretrain is not set; the weight-normalized "
              "forward will NOT be applied and metrics will be wrong")
    n_cls = cfg["NUM_CLASSES"]
    model = get_network(args.network, cfg["IN_CHANNELS"], n_cls, hebb=hebb)

    # variables are threaded as an argument (never a closure constant —
    # large inlined constants break remote-compile request limits)
    def apply_fn(patches, vs):
        out = model.apply(vs, patches, train=False)
        return primary_logits(args.network, out)

    dp = args.dp_devices
    mesh = None
    bs = args.batch_size
    if dp != 1:
        # sharded patch forward + device-resident aggregation in ONE
        # jitted program (make_device_slider mesh=...) — the TPU-native
        # replacement for the reference's NCCL DDP tester
        from ..parallel import make_mesh, replicated
        mesh = make_mesh(dp or None)
        variables = jax.device_put(variables, replicated(mesh))
        bs = -(-bs // mesh.devices.size) * mesh.devices.size

    ds = VolumeDataset3D(
        os.path.join(args.path_dataset, "val"), args.input1, split="test",
        sup=False, normalize=cfg.get("NORMALIZE", "mean"),
        num_classes=n_cls, fmt=cfg.get("FORMAT", ".nrrd"))
    path_seg = os.path.join(args.path_exp, "test_seg_preds")
    os.makedirs(path_seg, exist_ok=True)

    printer.rule("-")
    printer.line("Starting Testing")
    printer.rule("=")
    since = time.time()
    from ..data.augment3d import znormalize
    # one dispatch + one uint8 fetch per volume: the slider thresholds /
    # argmaxes ON DEVICE (8x less tunnel traffic than f32 logits), and
    # volume i's fetch overlaps volume i+1's dispatch (async jax dispatch)
    finalize = "binary" if n_cls == 2 else "argmax"
    thr = 0.5 if threshold is None else float(threshold)
    pending = None

    def flush(p):
        item_i, dev, crop = p
        write_nrrd(os.path.join(path_seg, item_i["id"]), crop(dev),
                   affine=item_i["affine"])

    for i in range(len(ds)):
        item = ds.load_raw(i)
        vol = znormalize(item["image"], cfg.get("NORMALIZE", "mean"))
        dev, crop = slide_window_inference_device(
            apply_fn, vol, patch_size, overlap, n_cls, batch_size=bs,
            fwd_args=(variables,), mesh=mesh, finalize=finalize,
            threshold=thr, fetch=False)
        if pending is not None:
            flush(pending)
        pending = (item, dev, crop)
    if pending is not None:
        flush(pending)
    elapsed = time.time() - since
    printer.line(f"Testing completed in {elapsed:.1f}s "
                 f"({len(ds) / max(elapsed, 1e-9):.3f} volumes/s)")

    path_eval = path_seg
    if args.postprocessing:
        path_eval = os.path.join(args.path_exp,
                                 "test_seg_preds_postprocessed")
        os.makedirs(path_eval, exist_ok=True)
        for fname in os.listdir(path_seg):
            pred, hdr = read_nrrd(os.path.join(path_seg, fname))
            pred = postprocess_3d_pred(pred, args.fill_hole_thr)
            write_nrrd(os.path.join(path_eval, fname), pred,
                       affine=hdr["affine"])

    results = offline_eval(path_eval,
                           os.path.join(args.path_dataset, "val", "mask"),
                           num_classes=n_cls)
    import pandas as pd
    pd.DataFrame([{
        "segm/dice": results["dice"],
        "segm/jaccard": results["jaccard"],
        "segm/asd": results["sd"],
        "segm/95hd": results["hd"],
    }]).to_csv(os.path.join(args.path_exp, "test.csv"), index=False)
    printer.line(f"Test  Dc: {results['dice']:.4f}  "
                 f"Jc: {results['jaccard']:.4f}  HD95: {results['hd']:.2f}"
                 f"  ASSD: {results['sd']:.2f}")
    printer.rule("=")
    return results


def main(argv=None):
    args = build_parser().parse_args(argv)
    return run_test(args)


if __name__ == "__main__":
    main()
