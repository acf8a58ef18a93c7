"""DeepWMH_predict — end-to-end TPU inference CLI.

Reproduces the reference CLI surface and output layout
(deepwmh/main/predict.py:50-199):

  -i images -n names -m model -o output [-g device | --mesh] [--skip-bfc]
  output/001_Preprocessed_Images/<case>_0000.nii.gz        (N4-corrected)
  output/002_Segmentations/001_raw/<case>.nii.gz           (raw U-Net seg)
  output/002_Segmentations/002_postproc_3mm/<case>.nii.gz  (3mm spark removal)
  output/002_Segmentations/003_postproc_fov/<case>.nii.gz  (brain FOV mask)
  output/003_Previews/<case>.gif

but with every external binary internalized: N4 bias correction, the 3D
U-Net sliding window, connected-component postprocessing and ROBEX-style
brain masking all run on the TPU. Every artifact is loadability-probed so
re-running resumes where it stopped.
"""

from __future__ import annotations

import argparse
import os

from deepwmh_tpu.cli.integrity import check_system_integrity
from deepwmh_tpu.core.manifests import check_dataset

# the per-case pipeline lives in the pipeline layer; re-exported here for
# backward compatibility (serving and tests import it from either place)
from deepwmh_tpu.pipeline.inference import (  # noqa: F401
    make_output_folders,
    predict_one_case,
)


def run_predict(
    input_images,
    case_names,
    model_dir,
    output_folder,
    skip_bfc: bool = False,
    tta: bool = True,
    make_previews: bool = True,
    checkpoint_name: str = "model_best",
    task_name: str | None = None,
    mesh: "jax.sharding.Mesh | None" = None,
):
    """mesh: when given, selects the sharded predictor — each volume's TTA
    sweep is split over the mesh devices (parallel/infer_sharded.py)."""
    from deepwmh_tpu.unet.infer import SlidingWindowPredictor
    from deepwmh_tpu.unet.release import load_released_model, resolve_model_dir

    model_dir = resolve_model_dir(model_dir, task_name)
    model, params, plan = load_released_model(model_dir, checkpoint_name)
    if mesh is not None:
        # shard each volume's sweep over the mesh (flip-sharded whole-volume
        # TTA / patch-sharded Gaussian sweep) — minimum per-volume latency,
        # same predict_one_case artifact contract (CaseProgramMixin)
        from deepwmh_tpu.parallel.infer_sharded import (
            ShardedSlidingWindowPredictor,
        )

        predictor = ShardedSlidingWindowPredictor(
            model, params, plan, mesh, tta=tta
        )
    else:
        predictor = SlidingWindowPredictor(model, params, plan, tta=tta)

    folders = make_output_folders(output_folder)
    for case, image_path in zip(case_names, input_images):
        print(">> case %s" % case, flush=True)
        predict_one_case(
            predictor, case, image_path, folders,
            skip_bfc=skip_bfc, make_previews=make_previews,
        )
    image_folder = folders["images"]
    post_fov_folder = folders["post_fov"]

    print("")
    print(">>> Prediction done.")
    print(">>> Preprocessed images: %s" % image_folder)
    print(">>> Segmentations: %s" % post_fov_folder)
    return post_fov_folder


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Do lesion segmentation using a pre-trained/installed model "
        "(TPU-native DeepWMH_predict).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-i", "--input-images", type=str, nargs="+", required=True,
                        help="Input image paths for prediction.")
    parser.add_argument("-n", "--case-names", type=str, nargs="+", required=True,
                        help="Case name for each input image.")
    parser.add_argument("-m", "--trained-model", type=str, required=True,
                        help="Root folder of the trained model (plan.json + model_best).")
    parser.add_argument("-o", "--output-folder", type=str, required=True,
                        help="Output folder for preprocessed images and segmentations.")
    parser.add_argument("-g", "--gpu", type=int, default=None,
                        help="Local accelerator index to pin this run to — "
                        "the reference's CUDA_VISIBLE_DEVICES role "
                        "(predict.py:150); lets N CLI runs share a "
                        "multi-chip host, one chip each (default: the "
                        "backend's default device).")
    parser.add_argument("--mesh", action="store_true",
                        help="Shard each volume's TTA sweep over every "
                        "device local to this host for minimum per-volume "
                        "latency (vs -g: N runs, one chip each, for "
                        "throughput). Mutually exclusive with -g.")
    parser.add_argument("--skip-bfc", action="store_true",
                        help="[Advanced] Skip N4 bias field correction.")
    parser.add_argument("--custom-task-name", type=str, default=None,
                        help="[Advanced] Pick one model package when the "
                        "model root contains several task folders "
                        "(reference predict.py:75,139-147).")
    parser.add_argument("--disable-tta", action="store_true",
                        help="[Advanced] Disable mirror test-time augmentation (8x faster).")
    parser.add_argument("--no-previews", action="store_true",
                        help="[Advanced] Skip GIF preview rendering.")
    parser.add_argument("--checkpoint", type=str, default="model_best",
                        help="[Advanced] Checkpoint to load from the model dir "
                        "(e.g. model_best, model_latest, model_ep_0042) — the "
                        "nnU-Net fork's -chk role.")
    parser.add_argument("--skip-integrity-check", action="store_true")
    args = parser.parse_args(argv)

    from deepwmh_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.mesh and args.gpu is not None:
        parser.error("--mesh and -g/--gpu are mutually exclusive")

    # argument errors must fail fast WITHOUT touching devices: jax.devices()
    # blocks forever when the TPU tunnel is down, so all cheap validation
    # runs before any mesh/device selection
    if len(args.case_names) != len(args.input_images):
        raise SystemExit(
            "Number of input images (%d) must equal number of case names (%d)."
            % (len(args.input_images), len(args.case_names))
        )
    if not args.skip_integrity_check and not check_system_integrity():
        raise SystemExit(1)

    dataset = {
        "case": list(args.case_names),
        "flair": [os.path.abspath(p) for p in args.input_images],
    }
    if not check_dataset(dataset):
        raise SystemExit(1)

    mesh = None
    if args.mesh:
        from deepwmh_tpu.parallel.mesh import make_mesh

        # local=True: this is a single-process CLI — on a multi-host pod
        # only THIS host's chips are addressable from one process
        mesh = make_mesh(local=True)
        print("mesh: sharding each sweep over %d device(s)" % mesh.size)
    if args.gpu is not None:
        from deepwmh_tpu.parallel.mesh import select_device

        select_device(args.gpu)

    run_predict(
        dataset["flair"],
        dataset["case"],
        args.trained_model,
        args.output_folder,
        skip_bfc=args.skip_bfc,
        tta=not args.disable_tta,
        make_previews=not args.no_previews,
        checkpoint_name=args.checkpoint,
        task_name=args.custom_task_name,
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
