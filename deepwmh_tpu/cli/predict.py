"""DeepWMH_predict — end-to-end TPU inference CLI.

Reproduces the reference CLI surface and output layout
(deepwmh/main/predict.py:50-199):

  -i images -n names -m model -o output [-g device] [--skip-bfc]
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

import numpy as np

from deepwmh_tpu.cli.integrity import check_system_integrity
from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import join_path, mkdir
from deepwmh_tpu.core.manifests import check_dataset


def make_output_folders(output_folder):
    """Create the reference's output layout; returns a dict of the six
    folders (deepwmh/main/predict.py:109-117)."""
    out = mkdir(output_folder)
    seg_folder = mkdir(join_path(out, "002_Segmentations"))
    return {
        "images": mkdir(join_path(out, "001_Preprocessed_Images")),
        "raw": mkdir(join_path(seg_folder, "001_raw")),
        "post_3mm": mkdir(join_path(seg_folder, "002_postproc_3mm")),
        "post_fov": mkdir(join_path(seg_folder, "003_postproc_fov")),
        "previews": mkdir(join_path(out, "003_Previews")),
    }


def predict_one_case(
    predictor,
    case,
    image_path,
    folders,
    skip_bfc: bool = False,
    make_previews: bool = True,
    preloaded=None,
):
    """One case through the full inference path (N4 → U-Net → 3mm → FOV →
    GIF) with a warm predictor. Shared by the batch CLI and the serving
    loop; every artifact is loadability-probed so re-running resumes.

    A FRESH case (no artifacts yet — every serve request, and the common
    batch case) runs the whole device pipeline as ONE fused program
    (predict_case_full): one dispatch instead of four, no intermediate
    reloads. A partially-computed case falls back to the stage-by-stage
    path so resume granularity is unchanged.

    preloaded: optional (data, hdr) for image_path, already loaded — the
    serving loop prefetches the next request's IO while the current one
    computes and passes it here."""
    import jax.numpy as jnp

    from deepwmh_tpu.eval.preview import nii_as_gif, nii_slice_range, try_load_gif
    from deepwmh_tpu.ops.brain import brain_extract
    from deepwmh_tpu.ops.components import remove_3mm_sparks
    from deepwmh_tpu.ops.n4 import n4_bias_correction_auto

    pre_path = join_path(folders["images"], "%s_0000.nii.gz" % case)
    raw_seg = join_path(folders["raw"], "%s.nii.gz" % case)
    seg_3mm = join_path(folders["post_3mm"], "%s.nii.gz" % case)
    seg_fov = join_path(folders["post_fov"], "%s.nii.gz" % case)

    fresh = not any(
        nifti.try_load_nifti(p) for p in (pre_path, raw_seg, seg_3mm, seg_fov)
    )
    raw_data = None
    if fresh:
        if preloaded is not None:
            data, hdr = preloaded
        else:
            data, hdr = nifti.load_nifti(image_path)
        raw_data = data
        spacing = [float(abs(z)) for z in hdr.zooms[:3]]
        pre, seg, s3, fov, _fg = predictor.predict_case_full(
            data, spacing, apply_n4=not skip_bfc
        )
        nifti.save_nifti(np.asarray(pre), hdr, pre_path)
        nifti.save_nifti(np.asarray(seg), hdr, raw_seg)
        nifti.save_nifti(np.asarray(s3), hdr, seg_3mm)
        nifti.save_nifti(np.asarray(fov), hdr, seg_fov)

    if not nifti.try_load_nifti(pre_path):
        data, hdr = nifti.load_nifti(image_path)
        if skip_bfc:
            nifti.save_nifti(data, hdr, pre_path)
        else:
            # big volumes route to the slab-sharded N4 on multi-device
            # backends (ops/n4.py n4_bias_correction_auto)
            corrected = np.asarray(n4_bias_correction_auto(jnp.asarray(data)))
            nifti.save_nifti(corrected, hdr, pre_path)

    if not nifti.try_load_nifti(raw_seg):
        data, hdr = nifti.load_nifti(pre_path)
        spacing = nifti.get_nifti_pixdim(pre_path)
        seg, _fg = predictor.predict_case(data, spacing)
        nifti.save_nifti(np.asarray(seg), hdr, raw_seg)

    if not nifti.try_load_nifti(seg_3mm):
        seg, hdr = nifti.load_nifti(raw_seg)
        spacing = nifti.get_nifti_pixdim(raw_seg)
        seg_pp = np.asarray(remove_3mm_sparks(jnp.asarray(seg), spacing))
        nifti.save_nifti(seg_pp, hdr, seg_3mm)

    if not nifti.try_load_nifti(seg_fov):
        flair, hdr = nifti.load_nifti(pre_path)
        spacing = tuple(nifti.get_nifti_pixdim(pre_path))
        mask = np.asarray(brain_extract(jnp.asarray(flair), spacing))
        seg = nifti.load_nifti_simple(seg_3mm)
        nifti.save_nifti(((seg * mask) > 0.5).astype(np.float32), hdr, seg_fov)

    if make_previews:
        out_gif = join_path(folders["previews"], "%s.gif" % case)
        if not try_load_gif(out_gif):
            data = (
                raw_data if raw_data is not None
                else nifti.load_nifti_simple(image_path)
            )
            s0, s1 = nii_slice_range(data, axis="axial")
            seg = nifti.load_nifti_simple(seg_fov)
            nii_as_gif(
                data,
                out_gif,
                axis="axial",
                lesion_mask=seg,
                side_by_side=True,
                slice_range=(s0, s1),
            )
    return seg_fov


def run_predict(
    input_images,
    case_names,
    model_dir,
    output_folder,
    skip_bfc: bool = False,
    tta: bool = True,
    make_previews: bool = True,
    checkpoint_name: str = "model_best",
):
    from deepwmh_tpu.unet.infer import SlidingWindowPredictor
    from deepwmh_tpu.unet.release import load_released_model

    model, params, plan = load_released_model(model_dir, checkpoint_name)
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
    parser.add_argument("-g", "--gpu", type=int, default=0,
                        help="Local accelerator index to pin this run to — "
                        "the reference's CUDA_VISIBLE_DEVICES role "
                        "(predict.py:150); lets N CLI runs share a "
                        "multi-chip host, one chip each.")
    parser.add_argument("--skip-bfc", action="store_true",
                        help="[Advanced] Skip N4 bias field correction.")
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

    if args.gpu:
        from deepwmh_tpu.parallel.mesh import select_device

        select_device(args.gpu)

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

    run_predict(
        dataset["flair"],
        dataset["case"],
        args.trained_model,
        args.output_folder,
        skip_bfc=args.skip_bfc,
        tta=not args.disable_tta,
        make_previews=not args.no_previews,
        checkpoint_name=args.checkpoint,
    )


if __name__ == "__main__":
    main()
