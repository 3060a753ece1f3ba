#!/usr/bin/env python
"""Entry point mirroring the reference's test_raddino_decoder_2d.py:
evaluates a trained decoder snapshot over the frozen encoder."""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from hebbax.cli.common import base_parser_2d  # noqa: F401 (args parity)
    from hebbax.cli.test_2d import build_parser, evaluate_test
    from hebbax.config.datasets import dataset_cfg, input_stats
    from hebbax.data import Loader, SegDataset2D
    from hebbax.models.raddino import (RadDinoDecoder, ViTEncoder,
                                       load_hf_rad_dino_params,
                                       reshape_patch_embeddings)
    from hebbax.ops.distance import evaluate_distance_binary
    from hebbax.utils.checkpoint import load_snapshot

    p = build_parser()
    args = p.parse_args(argv)
    cfg = dataset_cfg(args.dataset_name)
    n_cls = cfg["NUM_CLASSES"]
    name = "last" if args.best == "last" else f"best_{args.best}"
    variables, meta = load_snapshot(
        os.path.join(args.path_exp, "checkpoints", f"{name}.ckpt"))
    threshold = (meta.get("threshold")
                 if args.threshold is None else args.threshold)
    encoder, decoder = ViTEncoder(), RadDinoDecoder(n_cls)
    enc_params = encoder.init({"params": jax.random.PRNGKey(0)},
                              jnp.zeros((1, 224, 224, 3)))["params"]
    enc_params, _ = load_hf_rad_dino_params(enc_params)

    @jax.jit
    def forward(images):
        tokens = encoder.apply({"params": enc_params}, images)
        emb = reshape_patch_embeddings(tokens, 224)
        return decoder.apply(variables, emb, train=False)

    mean, std = input_stats(cfg, args.input1)
    ds = SegDataset2D(os.path.join(args.path_dataset, "val"), args.input1,
                      mean, std, split="test", sup=True, size=(224, 224))
    loader = Loader(ds, args.batch_size, shuffle=False,
                    num_workers=args.num_workers)
    probs_all, masks_all = [], []
    for batch in loader:
        logits = forward(jnp.asarray(batch["image"]))
        probs_all.append(np.asarray(
            jax.nn.softmax(logits, axis=-1)[..., 1]))
        masks_all.append(batch["mask"])
    probs = np.concatenate(probs_all)
    masks = np.concatenate(masks_all)
    pixel = evaluate_test(probs, masks, threshold, n_cls)
    dist = evaluate_distance_binary(probs, masks, [threshold])
    import pandas as pd
    pd.DataFrame([{
        "segm/dice": pixel[2], "segm/jaccard": pixel[1],
        "segm/asd": dist[1], "segm/95hd": dist[0], "thresh": pixel[0],
    }]).to_csv(os.path.join(args.path_exp, "test.csv"), index=False)
    print({"dice": pixel[2], "jaccard": pixel[1]})


if __name__ == "__main__":
    main()
