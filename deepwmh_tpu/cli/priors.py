"""DeepWMH_priors — build tissue priors by atlas propagation.

The fast replacement for the reference experiments' FreeSurfer recon-all
pathway (~3.5 h/subject, deepwmh/external_tools/FreeSurfer_aseg.py): register
one labeled atlas to each subject and warp the 4-class labels across
(seconds per subject on TPU). Emits label1 (brain mask) and label2 (tissue
classes) per subject — exactly the columns the reference.csv contract needs.
"""

from __future__ import annotations

import argparse

import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import join_path, mkdir
from deepwmh_tpu.core.manifests import load_csv_simple, write_csv_simple


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate label1/label2 tissue priors for a cohort by "
        "registering a labeled atlas to each subject.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-a", "--atlas-image", type=str, required=True)
    parser.add_argument("-l", "--atlas-label", type=str, required=True,
                        help="4-class label volume (0 bg, 1 cerebrum, "
                        "2 cerebellum+brainstem, 3 cortex).")
    parser.add_argument("-i", "--input-csv", type=str, required=True,
                        help="CSV with columns (case, flair).")
    parser.add_argument("-o", "--output-folder", type=str, required=True)
    parser.add_argument("--affine-only", action="store_true")
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args(argv)

    from deepwmh_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from deepwmh_tpu.registration.priors import propagate_atlas

    table = load_csv_simple(args.input_csv, key_names=["case", "flair"])
    out = mkdir(args.output_folder)
    atlas_img = nifti.load_nifti_simple(args.atlas_image)
    atlas_lbl = nifti.load_nifti_simple(args.atlas_label)
    atlas_sp = nifti.get_nifti_pixdim(args.atlas_image)

    rows = {"case": [], "flair": [], "label1": [], "label2": []}
    for case, flair in zip(table["case"], table["flair"]):
        l1_path = join_path(out, "%s_label1.nii.gz" % case)
        l2_path = join_path(out, "%s_label2.nii.gz" % case)
        if not (nifti.try_load_nifti(l1_path) and nifti.try_load_nifti(l2_path)):
            print("priors: %s" % case, flush=True)
            subj, hdr = nifti.load_nifti(flair)
            subj_sp = nifti.get_nifti_pixdim(flair)
            label, mask = propagate_atlas(
                atlas_img, atlas_lbl, subj,
                atlas_spacing=atlas_sp, subject_spacing=subj_sp,
                quick=args.quick, deformable=not args.affine_only,
            )
            nifti.save_nifti(mask.astype(np.float32), hdr, l1_path)
            nifti.save_nifti(label.astype(np.float32), hdr, l2_path)
        rows["case"].append(case)
        rows["flair"].append(flair)
        rows["label1"].append(l1_path)
        rows["label2"].append(l2_path)
    write_csv_simple(join_path(out, "priors_manifest.csv"), rows)
    print("priors written to %s" % out)


if __name__ == "__main__":
    main()
