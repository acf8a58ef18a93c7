"""DeepWMH_convert — import a reference (PyTorch nnU-Net) trained model.

Converts the reference's released/installed checkpoints
(deepwmh/pipeline/DCNN_multistage.py:608-638 release layout,
deepwmh/main/install_model.py:85-106 install layout) into this framework's
relocatable model package, so a user switching from the reference keeps
their trained weights (see docs/MIGRATION.md). Point -i at either an
installed model root, the trainer folder, or a *.model file directly.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert a reference DeepWMH (PyTorch nnU-Net) model "
        "into a deepwmh_tpu model package.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-i", "--input", type=str, required=True,
                        help="Installed reference model root, trainer "
                        "folder, or a model_best.model file.")
    parser.add_argument("-o", "--output-folder", type=str, required=True,
                        help="Output package folder (plan.json + weights).")
    parser.add_argument("-p", "--plans", type=str, default=None,
                        help="plans.pkl path (auto-discovered when omitted).")
    parser.add_argument("--which", type=str, default=None,
                        help="Which reference checkpoint file to convert "
                        "(e.g. model_latest.model). Default: model_best, "
                        "then final, then latest.")
    args = parser.parse_args(argv)

    from deepwmh_tpu.unet.torch_convert import (
        convert_nnunet_model,
        find_nnunet_model,
        find_nnunet_plans,
    )

    import os

    model = find_nnunet_model(args.input, which=args.which)
    plans = args.plans if args.plans is not None else find_nnunet_plans(
        model, args.input if os.path.isdir(args.input) else None)
    print("checkpoint: %s" % model)
    print("plans:      %s" % plans)
    out = convert_nnunet_model(model, plans, args.output_folder)
    print("Model package written to: %s" % out)
    print('Use it with: DeepWMH_predict -m "%s" ...' % out)


if __name__ == "__main__":
    main()
