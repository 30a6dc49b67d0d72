"""Import a published reference STrajNet ``.tf`` checkpoint into Orbax.

The reference trains with Keras ``save_weights('model_{ep}_{...}.tf')``
(reference train.py:358) and serves via ``load_weights(--weight_path)``
(inference.py:283). This tool converts such a checkpoint into an Orbax
params checkpoint this framework's inference/eval CLIs load directly —
so the published leaderboard model can be served WITHOUT retraining:

    python tools/import_ref_weights.py \
        --weight_path /path/to/final_model.tf \
        --out_dir ./ckpt_imported \
        [--ref_dir /root/reference] [--variant paper|train_py]

    python -m strajnet_tpu.infer.runner --weight_path ./ckpt_imported ...

``--variant paper`` (default) expects a checkpoint trained with
``fg_msa=True, fg=True`` (the paper architecture); ``train_py`` expects
the checked-in train.py variant (fg_msa off). The weight-name mapping is
golden-verified by tests/test_reference_parity_strajnet.py (forward parity
with copied weights) and tests/test_import_ref_weights.py (save_weights ->
import -> forward parity round trip).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weight_path", required=True,
                   help="reference Keras checkpoint prefix (the '...model.tf'"
                        " path passed to the reference's load_weights)")
    p.add_argument("--out_dir", required=True,
                   help="output Orbax checkpoint directory")
    p.add_argument("--ref_dir", default="/root/reference",
                   help="reference source checkout (modules.py etc.)")
    p.add_argument("--variant", choices=("paper", "train_py"),
                   default="paper")
    args = p.parse_args()

    # CPU is sufficient (and fastest to init) for a weight conversion.
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from strajnet_tpu.config import STRAJNET_CONFIG, STRAJNET_TRAIN_PY_CONFIG
    from strajnet_tpu.interop.ref_import import import_ref_checkpoint
    from strajnet_tpu.train.checkpoints import CheckpointManager

    cfg = (STRAJNET_CONFIG if args.variant == "paper"
           else STRAJNET_TRAIN_PY_CONFIG)
    params, cfg = import_ref_checkpoint(args.weight_path, model_cfg=cfg,
                                        ref_dir=args.ref_dir)

    mngr = CheckpointManager(args.out_dir)
    mngr.save(0, {"params": params},
              metrics={"imported_from": os.path.abspath(args.weight_path),
                       "variant": args.variant})
    mngr.close()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"imported {n:,} params -> {args.out_dir} (step 0)")


if __name__ == "__main__":
    main()
