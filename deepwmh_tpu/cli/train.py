"""DeepWMH_train — end-to-end annotation-free training CLI.

Reproduces the reference driver (deepwmh/main/train.py:62-277):

  -s reference.csv   (case, desc, flair, label1, label2)
  -t training.csv    (case, desc, flair)
  -o output          working folder
  [-r release]       model release folder
  [--core-folder]    pipeline state folder (default <output>/004_WMH_pipeline)

Flow: N4 preprocessing of every FLAIR -> all-pairs group registration of the
healthy reference cohort onto each training subject -> label propagation
(brain mask label1 + tissue prior label2, nearest neighbor) -> the 3-stage
self-training pipeline -> model release. Every phase resumes from artifacts;
a run_registration.sh-equivalent sharding is available via
`deepwmhGroupRegistration --distributed a/b` on multiple hosts sharing the
output filesystem.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from deepwmh_tpu.cli.integrity import check_system_integrity
from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import join_path, mkdir
from deepwmh_tpu.core.manifests import check_dataset, load_csv_simple, write_csv_simple


def n4_preprocess_cases(cases, flairs, out_folder, skip_bfc=False):
    """N4-correct every FLAIR into <out>/<case>.nii.gz (idempotent)."""
    import jax.numpy as jnp

    from deepwmh_tpu.ops.n4 import n4_bias_correction_auto

    out_paths = {}
    for case, flair in zip(cases, flairs):
        out_path = join_path(out_folder, "%s.nii.gz" % case)
        out_paths[case] = out_path
        if nifti.try_load_nifti(out_path):
            continue
        print("N4: %s" % case, flush=True)
        data, hdr = nifti.load_nifti(flair)
        if skip_bfc:
            nifti.save_nifti(data, hdr, out_path)
        else:
            corrected = np.asarray(n4_bias_correction_auto(jnp.asarray(data)))
            nifti.save_nifti(corrected, hdr, out_path)
    return out_paths


def registration_command(source_csv, target_csv, registration_folder, mode,
                         quick_registration, large_deformation,
                         svf_warm_start=False):
    """The recovery/sharding command emitted into run_registration.sh.

    The preset flags belong to the svf mode only — the registration CLI
    rejects `--learned` combined with them (cli/group_register.py) — so the
    emitted command must match the mode run_train actually selected, or the
    documented recovery path ("run run_registration.sh, then re-run this
    command") would always fail. Same for --svf-warm-start: the warm
    schedule is an svf-mode property and incompatible with --distributed,
    so it is only emitted when the run actually used it."""
    return (
        "deepwmhGroupRegistration -s '%s' -t '%s' -o '%s' --keep-deformation%s"
        % (
            source_csv, target_csv, registration_folder,
            " --learned" if mode == "learned" else (
                (" --allow-quick-registration" if quick_registration else "")
                + (" --allow-large-deformations" if large_deformation else "")
                + (" --svf-warm-start" if svf_warm_start else "")
            ),
        )
    )


def run_train(
    reference_csv,
    training_csv,
    output_folder,
    core_folder=None,
    release_folder=None,
    skip_bfc=False,
    quick_registration=True,
    large_deformation=True,
    budget=None,
    run_stages="full",
    distributed=None,
    batch_pairs=1,
    mesh=None,
    registration_mode="auto",
    learned_reg_cfg=None,
    svf_warm_start=False,
):
    """quick_registration/large_deformation both default ON: the training
    command the reference emits composes the two switches
    (deepwmh/main/train.py:215). mesh: a jax.sharding.Mesh shards
    registration pair batches AND pipeline training across devices.
    registration_mode: 'svf' (per-pair optimization), 'learned' (one
    amortized network, the reference's VoxelMorph pathway), or 'auto' —
    learned only where its estimated wall-clock win exceeds the
    quality-insurance factor of the voxel-scaled cost model
    (registration/policy.py; svf wins full-loop quality at every
    measured point, docs/PERF.md). learned_reg_cfg: optional LearnedRegConfig
    override for the learned mode's network (None = production config).
    svf_warm_start: seed each svf pair's deformable stage from the
    anchor-row composition and refine on the shortened schedule
    (registration/warm.py) — svf mode only, single-chip serial, measured
    equal label-overlap quality but NO end-to-end throughput win on a
    tunnel-attached chip (pairs are host/wire-bound; docs/PERF.md
    "SVF warm start")."""
    from deepwmh_tpu.pipeline.multistage import PipelineMultistage, StageBudget
    from deepwmh_tpu.registration.group import (
        GroupRegistration,
        apply_pair_transforms,
        pair_name,
    )
    from deepwmh_tpu.registration.policy import select_registration_mode

    # --distributed a/b shards a PAIR LIST across machines; the learned
    # mode has no pair list to shard (one shared template + network), and
    # two hosts running it would duplicate the most expensive work and race
    # on the same artifacts. auto resolves to svf under --distributed
    # (policy.py); an explicit request for both is a contradiction.
    if registration_mode == "learned" and distributed is not None:
        raise SystemExit(
            "--registration-mode learned cannot be combined with "
            "--distributed a/b: the learned mode trains ONE shared network "
            "(nothing to shard). Drop --distributed, or use "
            "--registration-mode svf/auto."
        )
    if svf_warm_start:
        # the warm schedule is an svf-mode property (registration/warm.py):
        # it composes per-pair SVF artifacts, which the learned mode does
        # not produce, and its anchor-row-first dependency rules out
        # --distributed pair sharding (registration/group.py).
        if registration_mode == "learned":
            raise SystemExit(
                "--svf-warm-start is an svf-mode schedule; it cannot be "
                "combined with --registration-mode learned."
            )
        if distributed is not None:
            raise SystemExit(
                "--svf-warm-start pairs depend on the anchor row's "
                "artifacts, which --distributed a/b cannot shard. Drop one "
                "of the two flags."
            )
        if registration_mode == "auto":
            # the flag states svf intent: warm start is the svf mode's
            # mid-scale accelerator, so it overrides the learned crossover
            registration_mode = "svf"

    # absolute from the start: the emitted regsource/regtarget CSVs and
    # run_registration.sh are a MULTI-MACHINE contract (another host runs
    # the script from an arbitrary cwd), so every embedded path must be
    # location-independent
    output_folder = mkdir(os.path.abspath(output_folder))
    core_folder = mkdir(core_folder or join_path(output_folder, "004_WMH_pipeline"))
    release_folder = mkdir(release_folder or join_path(core_folder, "Model_release"))

    reference_dataset = load_csv_simple(
        reference_csv, key_names=["case", "desc", "flair", "label1", "label2"]
    )
    training_dataset = load_csv_simple(training_csv, key_names=["case", "desc", "flair"])
    if not check_dataset(reference_dataset) or not check_dataset(training_dataset):
        raise SystemExit(1)
    # the cohorts share one preprocessing folder keyed by case name: a name
    # in both CSVs would silently alias the wrong image
    overlap = set(reference_dataset["case"]) & set(training_dataset["case"])
    if overlap:
        raise SystemExit(
            "case name(s) appear in BOTH reference and training CSVs: %s — "
            "rename one side." % sorted(overlap)
        )
    print(
        "reference cases: %d, training cases: %d"
        % (len(reference_dataset["case"]), len(training_dataset["case"]))
    )

    # 001: N4 preprocessing
    preproc_folder = mkdir(join_path(output_folder, "001_Preprocessed"))
    ref_paths = n4_preprocess_cases(
        reference_dataset["case"], reference_dataset["flair"], preproc_folder, skip_bfc
    )
    train_paths = n4_preprocess_cases(
        training_dataset["case"], training_dataset["flair"], preproc_folder, skip_bfc
    )

    # 002: group registration (refs -> each training subject)
    registration_folder = mkdir(join_path(output_folder, "002_Registration"))
    S = [(c, ref_paths[c]) for c in reference_dataset["case"]]
    T = [(c, train_paths[c]) for c in training_dataset["case"]]
    # emit the multi-host sharding manifest (reference train.py:186-223)
    write_csv_simple(
        join_path(output_folder, "regsource.csv"),
        {"case": reference_dataset["case"], "data": [ref_paths[c] for c in reference_dataset["case"]]},
    )
    write_csv_simple(
        join_path(output_folder, "regtarget.csv"),
        {"case": training_dataset["case"], "data": [train_paths[c] for c in training_dataset["case"]]},
    )
    # mean voxels/volume feeds the voxel-scaled cost model: small volumes
    # make svf pairs cheap, so auto keeps the measured-quality-winning svf
    # mode far past the bench-shape crossover (registration/policy.py)
    vox = [
        int(np.prod(nifti.get_nifti_header(p).shape[:3]))
        for p in list(ref_paths.values())[:8] + list(train_paths.values())[:8]
    ]
    mean_voxels = int(np.mean(vox)) if vox else None
    mode = select_registration_mode(
        len(S), len(T), mode=registration_mode, distributed=distributed,
        volume_voxels=mean_voxels,
    )
    print("registration mode: %s (%d pairs%s)"
          % (mode, len(S) * len(T),
             "" if registration_mode != "auto" else ", auto-selected"))
    if svf_warm_start:
        # --svf-warm-start pairs depend on the anchor row's artifacts, so
        # the emitted command CANNOT take --distributed k/n (the guard
        # above raises on that combination) — the recovery header must not
        # advise it (advisor finding, round 4)
        sh_header = (
            "#!/bin/sh\n"
            "# This command carries --svf-warm-start: it must run on a\n"
            "# SINGLE machine (warm pairs compose the anchor row's\n"
            "# artifacts, which --distributed k/n cannot shard). To spread\n"
            "# it over machines sharing this filesystem instead, drop\n"
            "# --svf-warm-start and add --distributed k/n on each shard.\n"
        )
    else:
        sh_header = (
            "#!/bin/sh\n"
            "# Distribute registration over machines sharing this filesystem by\n"
            "# running shard k of n on each: add --distributed k/n\n"
            "# (per-pair sharding applies to the svf mode; --learned trains\n"
            "#  one shared network on a single host instead)\n"
        )
    with open(join_path(output_folder, "run_registration.sh"), "w") as f:
        f.write(
            sh_header
            + registration_command(
                join_path(output_folder, "regsource.csv"),
                join_path(output_folder, "regtarget.csv"),
                registration_folder, mode,
                quick_registration, large_deformation,
                svf_warm_start=svf_warm_start,
            ) + "\n"
        )
    os.chmod(join_path(output_folder, "run_registration.sh"), 0o755)

    if mode == "learned":
        from deepwmh_tpu.registration.learned_group import (
            LearnedGroupRegistration,
        )

        reg = LearnedGroupRegistration(
            S, T, registration_folder, reg_cfg=learned_reg_cfg, mesh=mesh
        )
        reg.launch()
    else:
        reg = GroupRegistration(
            S, T, registration_folder, keep_deformation=True,
            quick=quick_registration,
            large_deformation=large_deformation, distributed=distributed,
            warm_start=svf_warm_start,
        )
        if svf_warm_start and not reg.warm_start:
            # GroupRegistration disables warm start when there is no anchor
            # row to compose (fewer than 2 sources) — make the fallback to
            # the cold schedule VISIBLE instead of quietly ignoring the
            # user's explicitly requested schedule (advisor finding, r4)
            print("svf warm start: disabled — needs >= 2 reference cases "
                  "to form an anchor row (%d given); running the cold "
                  "batched schedule instead" % len(S))
        if svf_warm_start and reg.warm_start:
            # the warm schedule is single-chip serial (anchor row first);
            # the mesh still applies to pipeline training below
            if mesh is not None:
                print("svf warm start: registration runs serially on one "
                      "chip (mesh still shards pipeline training)")
            reg.launch()
        else:
            if mesh is not None:
                batch_pairs = max(batch_pairs, int(mesh.size))
            reg.launch(batch_pairs=batch_pairs, mesh=mesh)

    # barrier: with --distributed a/b this shard only registered part of the
    # pair list; continue only when every pair's FULL artifact set (warped
    # image + affine.json + warp.nii.gz) loads cleanly — affine.json alone
    # would let a pair with a lost warp sail through into label propagation
    all_pairs = [
        (s, t) for s in reference_dataset["case"] for t in training_dataset["case"]
    ]
    missing = [
        pair_name(s, t) for s, t in all_pairs if not reg.pair_complete(s, t)
    ]
    if missing:
        print(
            "[!] %d/%d registration pair(s) not finished yet (e.g. %s)."
            % (len(missing), len(all_pairs), missing[0])
        )
        print(
            "    Run the remaining shards (see run_registration.sh), then "
            "re-run this command to continue."
        )
        raise SystemExit(2)

    # 003: propagate reference labels onto each training subject
    transformed_folder = mkdir(join_path(output_folder, "003_Transformed"))
    ref_idx = {c: i for i, c in enumerate(reference_dataset["case"])}
    for s in reference_dataset["case"]:
        for t in training_dataset["case"]:
            pair = pair_name(s, t)
            pair_dir = join_path(registration_folder, pair)
            out_dir = mkdir(join_path(transformed_folder, pair))
            outs = [
                join_path(out_dir, "label1.nii.gz"),
                join_path(out_dir, "label2.nii.gz"),
            ]
            # resume probe BEFORE apply_pair_transforms: it always decodes
            # the pair's dense warp field up front, so re-running a
            # 1000-pair prep would otherwise pay ~1000 full gzip decodes
            # to discover everything is already done
            if all(nifti.try_load_nifti(p) for p in outs):
                continue
            i = ref_idx[s]
            apply_pair_transforms(
                pair_dir,
                [reference_dataset["label1"][i], reference_dataset["label2"][i]],
                outs,
                interp="NearestNeighbor",
            )

    # 004: the 3-stage pipeline (mesh -> data-parallel training steps)
    pipeline = PipelineMultistage(core_folder, budget=budget or StageBudget(),
                                  mesh=mesh)
    for t in training_dataset["case"]:
        flair = train_paths[t]
        refs = [
            join_path(registration_folder, "%s.nii.gz" % pair_name(s, t))
            for s in reference_dataset["case"]
        ]
        l1 = [
            join_path(transformed_folder, pair_name(s, t), "label1.nii.gz")
            for s in reference_dataset["case"]
        ]
        l2 = [
            join_path(transformed_folder, pair_name(s, t), "label2.nii.gz")
            for s in reference_dataset["case"]
        ]
        desc = training_dataset["desc"][training_dataset["case"].index(t)]
        pipeline.add_training_case(t, flair, refs, l1, l2, description=desc)

    pipeline.run_training(run_stages=run_stages)

    if run_stages == "full":
        if len(os.listdir(release_folder)) > 0:
            print("[!] release folder not empty; skipping release.")
        else:
            pipeline.release_model(release_folder)
    return core_folder


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train the full annotation-free WMH segmentation pipeline "
        "end-to-end (TPU-native DeepWMH_train).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-s", "--reference", type=str, required=True,
                        help="Reference cohort CSV (case,desc,flair,label1,label2).")
    parser.add_argument("-t", "--training", type=str, required=True,
                        help="Training cohort CSV (case,desc,flair).")
    parser.add_argument("-o", "--output-folder", type=str, required=True)
    parser.add_argument("-j", "--num-CPU-cores", type=int, default=8,
                        help="Kept for CLI compatibility (compute runs on TPU).")
    parser.add_argument("-g", "--gpu", type=int, default=None,
                        help="Local accelerator index to pin this run to "
                        "(the reference's CUDA_VISIBLE_DEVICES role); "
                        "disables the auto device mesh unless --mesh is "
                        "explicitly set.")
    parser.add_argument("-r", "--release-model", type=str, required=False)
    parser.add_argument("--core-folder", type=str, required=False)
    parser.add_argument("--skip-bfc", action="store_true",
                        help="[Advanced] Skip N4 bias field correction.")
    parser.add_argument("--allow-quick-registration",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="Quick registration config (finest pyramid "
                        "level dropped). Both this and "
                        "--allow-large-deformations default ON — the "
                        "composed configuration the reference's training "
                        "driver emits (deepwmh/main/train.py:215).")
    parser.add_argument("--allow-large-deformations",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="Large-deformation capacity: bigger iteration "
                        "budget, 2^4 integration subdivisions, exact exp "
                        "gradient.")
    parser.add_argument("--mesh", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="Shard registration pair batches and training "
                        "steps over all visible devices. Default: on when "
                        "more than one device is visible.")
    parser.add_argument("--run-stages", choices=["initseg", "denoise", "full"],
                        default="full", help="[Advanced] Run a pipeline prefix.")
    parser.add_argument("--distributed", type=str, default=None,
                        help="[Advanced] 'a/b': run registration shard a of b.")
    parser.add_argument("--stage2-epochs", type=int, default=None,
                        help="[Advanced] Override the 50-epoch denoiser budget.")
    parser.add_argument("--stage3-epochs", type=int, default=None,
                        help="[Advanced] Override the 100-epoch final budget.")
    parser.add_argument("--batches-per-epoch", type=int, default=None,
                        help="[Advanced] Override the 150 batches/epoch budget.")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--batch-pairs", type=int, default=1,
                        help="[Advanced] Register N same-geometry pairs "
                        "simultaneously (one vmapped XLA program per chunk).")
    parser.add_argument("--registration-mode",
                        choices=["auto", "svf", "learned"], default="auto",
                        help="Pairwise registration engine: 'svf' optimizes "
                        "every pair, 'learned' trains ONE network and "
                        "registers each pair with a forward pass (the "
                        "reference's VoxelMorph pathway). 'auto' picks "
                        "learned only when the voxel-scaled cost model "
                        "estimates a >=2x wall-clock win (hundreds of "
                        "bench-shape pairs): svf won held-out Dice at "
                        "every measured full-loop point (docs/PERF.md).")
    parser.add_argument("--svf-warm-start", action="store_true",
                        help="[Advanced] Seed each svf registration pair "
                        "from the anchor-row composition and refine on a "
                        "shortened schedule (registration/warm.py). "
                        "Implies --registration-mode svf; incompatible "
                        "with --distributed; needs >= 2 reference cases. "
                        "Measured equal label-overlap quality but NO "
                        "end-to-end speed win on a tunnel-attached chip — "
                        "pairs are host/wire-bound (docs/PERF.md 'SVF "
                        "warm start'); consider it only on local hosts "
                        "with fast storage.")
    parser.add_argument("--skip-integrity-check", action="store_true")
    args = parser.parse_args(argv)

    from deepwmh_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    # multi-host pods: DEEPWMH_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID
    from deepwmh_tpu.parallel.mesh import init_distributed_from_env

    init_distributed_from_env()

    if not args.skip_integrity_check and not check_system_integrity():
        raise SystemExit(1)

    budget = None
    overrides = {
        "stage2_epochs": args.stage2_epochs,
        "stage3_epochs": args.stage3_epochs,
        "batches_per_epoch": args.batches_per_epoch,
        "batch_size": args.batch_size,
    }
    overrides = {k: v for k, v in overrides.items() if v is not None}
    if overrides:
        from deepwmh_tpu.pipeline.multistage import StageBudget

        budget = StageBudget(**overrides)

    # multi-chip: shard pair batches + DP training over every visible
    # device (auto when >1 device; --mesh/--no-mesh forces). The dp mesh is
    # the production path the dryrun validates (parallel/mesh.make_mesh).
    import jax

    mesh = None
    use_mesh = args.mesh if args.mesh is not None else jax.device_count() > 1
    if args.gpu is not None:
        # the reference's -g role (CUDA_VISIBLE_DEVICES, train.py:268):
        # pin this run to one chip — e.g. two cohorts training on one host
        from deepwmh_tpu.parallel.mesh import select_device

        select_device(args.gpu)
        use_mesh = False if args.mesh is None else use_mesh
        print("pinned to device %d" % args.gpu)
    if use_mesh:
        from deepwmh_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print("mesh: %d device(s) (%s)" % (mesh.size, jax.devices()[0].device_kind))

    run_train(
        args.reference,
        args.training,
        args.output_folder,
        core_folder=args.core_folder,
        release_folder=args.release_model,
        skip_bfc=args.skip_bfc,
        quick_registration=args.allow_quick_registration,
        large_deformation=args.allow_large_deformations,
        run_stages=args.run_stages,
        distributed=args.distributed,
        budget=budget,
        batch_pairs=args.batch_pairs,
        mesh=mesh,
        registration_mode=args.registration_mode,
        svf_warm_start=args.svf_warm_start,
    )


if __name__ == "__main__":
    main()
