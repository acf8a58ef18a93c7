"""OASIS-3 end-to-end replication recipe (TPU-native).

Rebuild of the reference experiment scripts
(experiments/010_OASIS3/run_Siemens_Biograph_mMR.py / run_Siemens_TrioTim.py):
pick a healthy reference cohort + a WMH training cohort from OASIS-3
T2-FLAIR scans, build tissue priors, train the annotation-free pipeline,
and evaluate the training fit against expert raters.

Differences from the reference (all by design — no external binaries):
- FSL bet/flirt skull-strip + alignment        -> not needed: the pipeline
  registers full-head FLAIRs directly (brain masks come from the priors)
- FreeSurfer recon-all aseg (~3.5 h/subject)   -> DeepWMH_priors atlas
  propagation (seconds/subject on TPU)
- DeepWMH_train shells out to nnU-Net/ANTs     -> everything runs in-process
  on TPU

Usage:
  python run_oasis3.py --oasis-root /path/to/OASIS3 \
      --atlas-image atlas_flair.nii.gz --atlas-label atlas_label.nii.gz \
      --output ./oasis3_experiment \
      [--scanner mMR|TrioTim] [--rater-dir /path/to/expert_masks]

Expected OASIS-3 layout: <root>/<subject>/.../*FLAIR*.nii.gz — adjust
`collect_flairs` for your download layout. Subject lists below follow the
reference cohorts (10 healthy references; WMH training subjects per
scanner).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

from deepwmh_tpu.core.artifacts import join_path, mkdir
from deepwmh_tpu.core.manifests import write_csv_simple

# Reference cohort sizes (run_Siemens_Biograph_mMR.py:61-121): 10 healthy
# reference subjects and 100 (mMR) / 50 (TrioTim) training subjects. Fill
# these with your OASIS-3 accession ids.
REFERENCE_SUBJECTS = ["OAS3%04d" % i for i in range(1, 11)]
TRAINING_SUBJECTS = {"mMR": [], "TrioTim": []}  # fill from your manifest


def collect_flairs(oasis_root: str, subjects):
    out = {}
    for s in subjects:
        hits = sorted(
            glob.glob(os.path.join(oasis_root, s, "**", "*FLAIR*.nii.gz"),
                      recursive=True)
        )
        if hits:
            out[s] = hits[0]
        else:
            print("[warn] no FLAIR found for %s" % s)
    return out


def run(cmd):
    print("+ %s" % " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--oasis-root", required=True)
    ap.add_argument("--atlas-image", required=True)
    ap.add_argument("--atlas-label", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--scanner", default="mMR", choices=list(TRAINING_SUBJECTS))
    ap.add_argument("--rater-dir", default=None,
                    help="Folder with expert masks <case>.nii.gz for evaluation.")
    args = ap.parse_args(argv)

    out = mkdir(args.output)
    refs = collect_flairs(args.oasis_root, REFERENCE_SUBJECTS)
    train = collect_flairs(args.oasis_root, TRAINING_SUBJECTS[args.scanner])
    if not refs or not train:
        sys.exit("empty cohort — fill REFERENCE_SUBJECTS / TRAINING_SUBJECTS")

    # 1) tissue priors for the reference cohort (FreeSurfer replacement)
    prior_csv = join_path(out, "ref_flairs.csv")
    write_csv_simple(prior_csv, {"case": list(refs), "flair": list(refs.values())})
    priors_dir = join_path(out, "priors")
    run(["DeepWMH_priors", "-a", args.atlas_image, "-l", args.atlas_label,
         "-i", prior_csv, "-o", priors_dir, "--quick"])

    # 2) training manifests (the reference.csv / training.csv contract)
    ref_csv = join_path(out, "reference.csv")
    write_csv_simple(ref_csv, {
        "case": list(refs),
        "desc": ["healthy"] * len(refs),
        "flair": list(refs.values()),
        "label1": [join_path(priors_dir, "%s_label1.nii.gz" % c) for c in refs],
        "label2": [join_path(priors_dir, "%s_label2.nii.gz" % c) for c in refs],
    })
    train_csv = join_path(out, "training.csv")
    write_csv_simple(train_csv, {
        "case": list(train),
        "desc": ["WMH_%s" % args.scanner] * len(train),
        "flair": list(train.values()),
    })

    # 3) train the full pipeline (reference :255-256)
    run(["DeepWMH_train", "-s", ref_csv, "-t", train_csv, "-o", out,
         "-r", join_path(out, "release")])

    # 4) evaluate the training fit against expert raters (reference :266-300)
    if args.rater_dir:
        fit_dir = join_path(out, "004_WMH_pipeline", "Stage_3_DCNN_training",
                            "002_training_fit", "3mm_postproc")
        run(["DeepWMH_evaluate", "-p", fit_dir, "-g", args.rater_dir,
             "-o", join_path(out, "evaluation.json")])


if __name__ == "__main__":
    main()
