"""CLI entry point (SURVEY.md §2 L6: 'python <train script> --config <exp.json>').

Usage:
  cerberus-train --config configs/cerberus_synthetic.json
  python -m cerberusnet_tpu.cli --config cfg.json --eval-only
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="cerberus-train",
        description="Train/evaluate cerberusnet_tpu models from a JSON config.",
    )
    ap.add_argument("--config", required=True, help="path to ExperimentConfig JSON")
    ap.add_argument("--eval-only", action="store_true", help="run evaluation only")
    ap.add_argument(
        "--predict-dir", default=None, metavar="DIR",
        help="run inference over the eval split and write benchmark-format "
        "predictions (KITTI 16-bit flow/disparity PNGs, Cityscapes labelId "
        "semantics) into DIR, then exit",
    )
    ap.add_argument(
        "--infer", default=None, metavar="IMG[,IMG...]",
        help="single-sample inference on image files (comma-separated, in "
        "the variant's input order, e.g. left.png,right.png,temporal.png); "
        "writes raw .npz, benchmark PNGs and a colorized panel, then exits",
    )
    ap.add_argument(
        "--infer-out", default="predictions", metavar="DIR",
        help="output directory for --infer (default: predictions/)",
    )
    ap.add_argument(
        "--import-torch", default=None, metavar="CKPT",
        help="load a PyTorch checkpoint (reference weights) into the model "
        "via the torch mirror before any other action (joint variant only)",
    )
    ap.add_argument("--ckpt-dir", default=None, help="override train.ckpt_dir")
    ap.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture an XProf trace of a few train steps into DIR and exit",
    )
    ap.add_argument(
        "--print-config", action="store_true", help="dump the parsed config and exit"
    )
    ap.add_argument(
        "--export-dir", default=None, metavar="DIR",
        help="AOT-export the (restored) model to DIR and exit",
    )
    ap.add_argument(
        "--quant", default=None, choices=["int8"],
        help="with --export-dir: calibration-based int8 PTQ of the exported "
        "graph (the TensorRT-int8 analogue; convs run on the MXU s8 path)",
    )
    ap.add_argument(
        "--export-stacked", action="store_true",
        help="with --export-dir (cerberus variant): export the "
        "producer-stacked signature — ONE (3B,H,W,3) input; pjrt_runner "
        "then assembles the three decoded PNGs into a single contiguous "
        "host buffer, skipping the per-frame device relayout copies",
    )
    args = ap.parse_args(argv)

    from cerberusnet_tpu.train.config import ExperimentConfig

    config = ExperimentConfig.from_json(args.config)
    if args.ckpt_dir is not None:
        config.train.ckpt_dir = args.ckpt_dir
    if args.print_config:
        print(config.to_json())
        return 0

    from cerberusnet_tpu.train.trainer import Trainer

    trainer = Trainer(config)
    if args.import_torch:
        trainer.import_torch_weights(args.import_torch)
    if args.profile:
        out = trainer.profile(args.profile)
        print(f"trace written to {out}")
        return 0
    if args.export_dir:
        out = trainer.export(
            args.export_dir, quant=args.quant, stacked=args.export_stacked
        )
        print(f"exported AOT artifact to {out}")
        return 0
    if args.infer:
        imgs = [p for p in args.infer.split(",") if p]
        if len(imgs) != len(trainer.example_keys):
            ap.error(
                f"--infer needs {len(trainer.example_keys)} images "
                f"({','.join(trainer.example_keys)}), got {len(imgs)}"
            )
        made = trainer.predict_images(
            dict(zip(trainer.example_keys, imgs)), args.infer_out
        )
        print("\n".join(made))
        return 0
    if args.predict_dir:
        made = trainer.predict_to_dir(args.predict_dir)
        print(f"wrote {len(made)} prediction files to {args.predict_dir}")
        return 0
    if args.eval_only:
        print(json.dumps(trainer.evaluate(), indent=2))
        return 0
    trainer.fit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
