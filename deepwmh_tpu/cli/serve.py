"""DeepWMH_serve — warm-model spool-directory inference serving.

No reference equivalent: the reference's only inference surface is the
batch DeepWMH_predict CLI, which pays process startup + model load per
invocation (deepwmh/main/predict.py:50-199). This server loads and
compiles the model once and then streams volumes dropped into a spool
directory through the warm predictor — the TPU-idiomatic deployment shape
(compile once, keep the program resident, feed it data).

  DeepWMH_serve -m MODEL -s SPOOL -o OUT            # poll until SPOOL/STOP
  DeepWMH_serve -m MODEL -s SPOOL -o OUT --once     # drain and exit

Request  = drop <case>.nii.gz into SPOOL.
Response = DeepWMH_predict's exact output layout under OUT, plus a
           SPOOL/.done/<case>.json receipt (or .failed/<case>.err).
Scale-out = run one server per chip/host against a shared SPOOL; claims
           are atomic renames, so each request runs exactly once.
"""

from __future__ import annotations

import argparse
import signal


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Serve lesion segmentation from a spool directory with a "
        "warm (compile-once) model.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-m", "--trained-model", type=str, required=True,
                        help="Root folder of the trained model (plan.json + model_best).")
    parser.add_argument("-s", "--spool", type=str, required=True,
                        help="Spool directory watched for <case>.nii.gz requests.")
    parser.add_argument("-o", "--output-folder", type=str, required=True,
                        help="Output folder (DeepWMH_predict layout).")
    parser.add_argument("--once", action="store_true",
                        help="Drain the spool once and exit instead of polling.")
    parser.add_argument("--poll-interval", type=float, default=2.0,
                        help="Seconds between spool polls when idle.")
    parser.add_argument("--settle-seconds", type=float, default=2.0,
                        help="Only claim requests whose mtime is this old — "
                        "guards against claiming files mid-copy. Clients "
                        "that rename into the spool can set 0.")
    parser.add_argument("--stale-after", type=float, default=1800.0,
                        help="Re-spool another server's claimed requests "
                        "when its heartbeat is older than this (crash "
                        "recovery across server ids).")
    parser.add_argument("--server-id", type=str, default=None,
                        help="Stable id for this server's work/status files "
                        "(default: srv<pid>); reuse an id to recover its "
                        "crashed claims.")
    parser.add_argument("-g", "--device", type=int, default=None,
                        help="Local accelerator index to pin this server to "
                        "(one server per chip against a shared spool). "
                        "Mutually exclusive with --mesh.")
    parser.add_argument("--mesh", action="store_true",
                        help="Shard each volume's TTA/patch sweep over all "
                        "local devices (minimum per-volume latency). "
                        "Without this, scale throughput by running one "
                        "server per chip against the same spool.")
    parser.add_argument("--skip-bfc", action="store_true",
                        help="[Advanced] Skip N4 bias field correction.")
    parser.add_argument("--disable-tta", action="store_true",
                        help="[Advanced] Disable mirror test-time augmentation.")
    parser.add_argument("--no-previews", action="store_true",
                        help="[Advanced] Skip GIF preview rendering.")
    parser.add_argument("--checkpoint", type=str, default="model_best",
                        help="[Advanced] Checkpoint to load from the model dir.")
    parser.add_argument("--custom-task-name", type=str, default=None,
                        help="[Advanced] Pick one model package when the "
                        "model root contains several task folders "
                        "(same semantics as DeepWMH_predict).")
    parser.add_argument("--batch-max", type=int, default=None,
                        help="Burst batching: same-geometry requests pending "
                        "at the same moment run as ONE program, up to this "
                        "many (bounded latency: a lone request never waits "
                        "for companions). Default is the measured policy: 1 "
                        "on a single chip (batching within one device is a "
                        "throughput LOSS — docs/PERF.md), one case per "
                        "device with --mesh (capped at the mesh size). Set "
                        "explicitly to override the single-chip default.")
    args = parser.parse_args(argv)

    from deepwmh_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from deepwmh_tpu.pipeline.serve import SpoolServer

    if args.mesh and args.device is not None:
        parser.error("--mesh and --device are mutually exclusive")
    mesh = None
    if args.mesh:
        import jax

        from deepwmh_tpu.parallel.mesh import make_mesh

        # local=True: a single-process server can only address this host's
        # chips (same reasoning as DeepWMH_predict --mesh)
        mesh = make_mesh(local=True)
        print("mesh: sharding each sweep over %d device(s)" % mesh.size)
    elif args.device is not None:
        from deepwmh_tpu.parallel.mesh import select_device

        dev = select_device(args.device)
        print("pinned to device %d (%s)" % (args.device, dev.device_kind))

    server = SpoolServer(
        args.spool,
        args.output_folder,
        args.trained_model,
        skip_bfc=args.skip_bfc,
        tta=not args.disable_tta,
        make_previews=not args.no_previews,
        checkpoint_name=args.checkpoint,
        poll_interval=args.poll_interval,
        server_id=args.server_id,
        mesh=mesh,
        settle_seconds=args.settle_seconds,
        stale_after=args.stale_after,
        task_name=args.custom_task_name,
        batch_max=args.batch_max,
    )

    # finish the in-flight case, then exit cleanly
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: server.request_stop())

    if args.once:
        server.recover_work()
        server.recover_stale(args.stale_after)
        served, failed = server.drain()
        print("drained: %d served, %d failed" % (served, failed), flush=True)
        return 1 if failed else 0
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
