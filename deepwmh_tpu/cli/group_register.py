"""deepwmhGroupRegistration — standalone all-pairs registration CLI.

Counterpart of the reference `antsGroupRegistration` console script
(deepwmh/external_tools/ANTs_group_registration.py:277-391), including the
manual multi-machine `--distributed a/b` protocol: machines sharing the
output filesystem each run one shard; completed pairs are skipped by the
loadability probes, so re-running after failures is safe.
"""

from __future__ import annotations

import argparse

from deepwmh_tpu.core.manifests import load_csv_simple


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Register every source image onto every target image "
        "(rigid + affine + diffeomorphic SVF on TPU).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-s", "--source", type=str, required=True,
                        help="Source CSV with columns (case, data).")
    parser.add_argument("-t", "--target", type=str, required=True,
                        help="Target CSV with columns (case, data).")
    parser.add_argument("-o", "--output-folder", type=str, required=True)
    parser.add_argument("-j", "--jobs", type=int, default=1,
                        help="Kept for CLI compatibility (pairs run sequentially "
                        "on the accelerator).")
    parser.add_argument("--keep-deformation", action="store_true",
                        help="Keep dense warp fields (needed for label propagation; "
                        "~6x more disk, reference :327-332).")
    parser.add_argument("--allow-quick-registration", action="store_true",
                        help="Fewer iterations / coarser finest level (~30-40%% faster).")
    parser.add_argument("--allow-large-deformations", action="store_true",
                        help="More iterations for large anatomical differences.")
    parser.add_argument("--affine-only", action="store_true",
                        help="Skip the deformable stage.")
    parser.add_argument("--learned", action="store_true",
                        help="Amortized mode (the reference's VoxelMorph "
                        "pathway): build an affine template, train one "
                        "registration network on the cohort, register every "
                        "pair with a single forward pass.")
    parser.add_argument("--mesh", action="store_true",
                        help="Use ALL visible devices (jax.sharding.Mesh). "
                        "Classic mode: shards batched pairs, each chip "
                        "registers its own (raises --batch-pairs to the "
                        "device count). Learned mode: data-parallels the "
                        "network-training pair batches; pairs then register "
                        "with single forward passes.")
    parser.add_argument("--batch-pairs", type=int, default=1,
                        help="Register N same-geometry pairs simultaneously "
                        "in one vmapped XLA program (TPU throughput).")
    parser.add_argument("-d", "--distributed", type=str, default=None,
                        help="'a/b': run shard a (1-based) of b machines.")
    parser.add_argument("--svf-warm-start", action="store_true",
                        help="Seed each pair's SVF from the composition of "
                        "the anchor-source row and source->anchor pairs, "
                        "refined on a shortened schedule (needs >= 2 "
                        "sources, --keep-deformation, no --distributed/"
                        "--mesh/--batch-pairs; registration/warm.py).")
    args = parser.parse_args(argv)

    from deepwmh_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from deepwmh_tpu.registration.group import GroupRegistration

    src = load_csv_simple(args.source, key_names=["case", "data"])
    tgt = load_csv_simple(args.target, key_names=["case", "data"])
    sources = list(zip(src["case"], src["data"]))
    targets = list(zip(tgt["case"], tgt["data"]))

    if args.learned:
        from deepwmh_tpu.registration.learned_group import LearnedGroupRegistration

        if args.distributed:
            raise SystemExit("--learned trains one shared network; shard the "
                             "pair list only in the classic mode.")
        # reject silently-ignored classic-mode flags rather than letting a
        # user believe they took effect (warps are ALWAYS kept in learned
        # mode; the pyramid/batching knobs are classic-only)
        ignored = [
            name for name, on in [
                ("--affine-only", args.affine_only),
                ("--allow-quick-registration", args.allow_quick_registration),
                ("--allow-large-deformations", args.allow_large_deformations),
                ("--batch-pairs", args.batch_pairs != 1),
                ("--svf-warm-start", args.svf_warm_start),
            ] if on
        ]
        if ignored:
            raise SystemExit(
                "--learned does not support: %s (learned mode always keeps "
                "deformations; pyramid/batching flags are classic-mode "
                "only)." % " ".join(ignored)
            )
        mesh = None
        if args.mesh:
            import jax

            from deepwmh_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            print(
                "mesh: dp pair batches over %d device(s) for network training"
                % jax.device_count()
            )
        lg = LearnedGroupRegistration(
            sources, targets, args.output_folder, mesh=mesh
        )
        lg.launch()
        print("learned group registration finished.")
        return

    reg = GroupRegistration(
        sources,
        targets,
        args.output_folder,
        keep_deformation=args.keep_deformation,
        quick=args.allow_quick_registration,
        large_deformation=args.allow_large_deformations,
        distributed=args.distributed,
        deformable=not args.affine_only,
        warm_start=args.svf_warm_start,
    )
    print("%d registration pair(s) in this shard." % len(reg.tasks))
    mesh = None
    batch_pairs = args.batch_pairs
    if args.mesh:
        from deepwmh_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        batch_pairs = max(batch_pairs, int(mesh.size))
        print("mesh: sharding pair batches over %d device(s)" % int(mesh.size))
    reg.launch(batch_pairs=batch_pairs, mesh=mesh)
    print("group registration finished.")


if __name__ == "__main__":
    main()
