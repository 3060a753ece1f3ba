"""Prediction image dumps (PNG, paletted) — reference save_preds parity
(/root/reference/utils.py:58-94): binary predictions thresholded at the
epoch's selected threshold (multiclass: argmax), saved as 'P'-mode PNGs
with the dataset palette under {train,val}_seg_preds/.
"""

import os

import numpy as np
from PIL import Image


def save_pred_png(pred, path, palette):
    img = Image.fromarray(pred.astype(np.uint8), mode="P")
    img.putpalette(palette)
    img.save(path)


def save_preds(probs_fg_or_labels, threshold, names, out_dir, palette):
    """probs_fg_or_labels: (N,H,W) foreground probabilities (binary task,
    thresholded here) or integer labels (threshold=None)."""
    os.makedirs(out_dir, exist_ok=True)
    arr = np.asarray(probs_fg_or_labels)
    for i, name in enumerate(names):
        if threshold is not None:
            pred = (arr[i] > threshold).astype(np.uint8)
        else:
            pred = arr[i].astype(np.uint8)
        save_pred_png(pred, os.path.join(out_dir, str(name)), palette)
