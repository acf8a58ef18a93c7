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
    parser.add_argument("--checkpoint-name", type=str, default="model_best")
    args = parser.parse_args(argv)

    from deepwmh_tpu.unet.torch_convert import (
        convert_nnunet_model,
        find_nnunet_checkpoint,
    )

    if args.plans is not None:
        from deepwmh_tpu.unet.torch_convert import find_nnunet_checkpoint as _f
        model, _ = _f(args.input)
        plans = args.plans
    else:
        model, plans = find_nnunet_checkpoint(args.input)
    print("checkpoint: %s" % model)
    print("plans:      %s" % plans)
    out = convert_nnunet_model(model, plans, args.output_folder,
                               checkpoint_name=args.checkpoint_name)
    print("Model package written to: %s" % out)
    print('Use it with: DeepWMH_predict -m "%s" ...' % out)


if __name__ == "__main__":
    main()
