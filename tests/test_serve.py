"""Spool-directory serving (pipeline/serve.py + cli/serve.py).

The reference has no serving mode (its only inference surface is the
batch CLI, deepwmh/main/predict.py); these tests cover the new
capability's contract: atomic claims, receipts, failure quarantine,
crash recovery, STOP, and the --once CLI drive.
"""

import json
import os

import jax
import numpy as np
import pytest

from deepwmh_tpu.core import nifti
from deepwmh_tpu.pipeline.serve import SpoolServer, case_name_of
from deepwmh_tpu.unet import checkpoint as ckpt
from deepwmh_tpu.unet.model import UNet3D, init_params
from deepwmh_tpu.unet.plan import Plan
from deepwmh_tpu.unet.release import release_model


def tiny_model_dir(tmp_path):
    plan = Plan(
        target_spacing=[2.0, 2.0, 2.0],
        patch_size=[16, 16, 16],
        batch_size=2,
        pool_kernels=[[2, 2, 2], [2, 2, 2]],
        conv_kernels=[[3, 3, 3], [3, 3, 3], [3, 3, 3]],
        base_features=4,
        max_features=8,
    )
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(0))
    train_dir = str(tmp_path / "train")
    ckpt.save_checkpoint(train_dir, "model_best", params, meta={"epoch": 1})
    rel_dir = str(tmp_path / "release")
    release_model(train_dir, plan, rel_dir, make_tarball=False)
    return rel_dir


def head_volume(shape=(24, 24, 20), seed=0):
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    tex = np.random.RandomState(seed).rand(*shape).astype(np.float32)
    return ((r < 0.8) * (200 + 30 * tex)).astype(np.float32)


def spool_request(spool, case, seed=0):
    hdr = nifti.NiftiHeader()
    hdr.set_shape((24, 24, 20))
    hdr.set_zooms((2.0, 2.0, 2.0))
    nifti.save_nifti(head_volume(seed=seed), hdr, os.path.join(spool, case + ".nii.gz"))


def test_case_name_of():
    assert case_name_of("abc.nii.gz") == ("abc", ".nii.gz")
    assert case_name_of("a.b.nii") == ("a.b", ".nii")
    assert case_name_of("STOP") is None
    assert case_name_of(".nii.gz") is None
    assert case_name_of("notes.txt") is None


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """One server draining two requests — shared across assertions."""
    tmp_path = tmp_path_factory.mktemp("serve")
    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    spool_request(spool, "caseA", seed=0)
    spool_request(spool, "caseB", seed=1)

    srv = SpoolServer(
        spool, str(tmp_path / "out"), model_dir,
        skip_bfc=True, tta=False, make_previews=False, server_id="t1", settle_seconds=0.0,
    )
    served, failed = srv.drain()
    return srv, spool, str(tmp_path / "out"), served, failed


def test_drain_serves_all(served):
    srv, spool, out, n_served, n_failed = served
    assert (n_served, n_failed) == (2, 0)
    for case in ("caseA", "caseB"):
        seg = os.path.join(out, "002_Segmentations", "003_postproc_fov", case + ".nii.gz")
        assert nifti.try_load_nifti(seg), seg
        receipt = os.path.join(spool, ".done", case + ".json")
        r = json.load(open(receipt))
        assert r["case"] == case and r["latency_s"] >= 0
        assert r["segmentation"].endswith(case + ".nii.gz")
    # spool empty, nothing left claimed
    assert [f for f in os.listdir(spool) if case_name_of(f)] == []
    assert os.listdir(os.path.join(spool, ".work", "t1")) == []


def test_status_file(served):
    srv, spool, out, *_ = served
    status = json.load(open(os.path.join(spool, ".status", "t1.json")))
    assert status["served"] == 2 and status["failed"] == 0
    assert status["last_ok"] is True


def test_failed_request_is_quarantined(served):
    srv, spool, out, *_ = served
    bad = os.path.join(spool, "broken.nii.gz")
    with open(bad, "wb") as f:
        f.write(b"this is not a nifti file")
    served_n, failed_n = srv.drain()
    assert (served_n, failed_n) == (0, 1)
    assert os.path.isfile(os.path.join(spool, ".failed", "broken.nii.gz"))
    err = open(os.path.join(spool, ".failed", "broken.err")).read()
    assert "Traceback" in err
    # a failure must not poison subsequent requests
    spool_request(spool, "caseC", seed=2)
    assert srv.drain() == (1, 0)


def test_stop_sentinel(served):
    srv, spool, out, *_ = served
    spool_request(spool, "caseD", seed=3)
    stop = os.path.join(spool, "STOP")
    open(stop, "w").close()
    try:
        assert srv.stop_requested()
        assert srv.drain() == (0, 0)  # refuses new work
    finally:
        os.remove(stop)
    assert srv.drain() == (1, 0)  # resumes after STOP removed


def test_crash_recovery(served):
    srv, spool, out, *_ = served
    # simulate a crashed claim: a request stuck in this server's work dir
    spool_request(spool, "caseE", seed=4)
    os.rename(
        os.path.join(spool, "caseE.nii.gz"),
        os.path.join(spool, ".work", "t1", "caseE.nii.gz"),
    )
    assert srv.drain() == (0, 0)  # not claimable while stuck
    assert srv.recover_work() == 1
    assert srv.drain() == (1, 0)


def test_claim_is_exclusive(served):
    """Claims are consume-once: a claimed request is gone from the spool,
    so a second server's claim_one can never double-run it (exclusivity
    is a property of the atomic rename, not of server identity)."""
    srv, spool, out, *_ = served
    spool_request(spool, "caseF", seed=5)
    first = srv.claim_one()
    assert first is not None and first[0] == "caseF"
    assert srv.claim_one() is None  # already claimed — no double-claim
    os.rename(first[1], os.path.join(spool, "caseF.nii.gz"))  # put it back
    assert srv.drain() == (1, 0)


def test_serve_cli_once(tmp_path):
    from deepwmh_tpu.cli.serve import main

    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    spool_request(spool, "cli_case", seed=7)
    rc = main([
        "-m", model_dir, "-s", spool, "-o", str(tmp_path / "out"),
        "--once", "--skip-bfc", "--disable-tta", "--no-previews",
        "--server-id", "cli1", "--settle-seconds", "0",
    ])
    assert rc == 0
    seg = os.path.join(
        str(tmp_path / "out"), "002_Segmentations", "003_postproc_fov",
        "cli_case.nii.gz",
    )
    assert nifti.try_load_nifti(seg)
    assert os.path.isfile(os.path.join(spool, ".done", "cli_case.json"))


def test_serve_with_mesh(tmp_path):
    """SpoolServer(mesh=...) serves through the sharded predictor (the
    DeepWMH_serve --mesh path)."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from deepwmh_tpu.parallel.mesh import make_mesh

    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    spool_request(spool, "mesh_case", seed=9)
    srv = SpoolServer(
        spool, str(tmp_path / "out"), model_dir,
        skip_bfc=True, tta=True, make_previews=False, server_id="m1", settle_seconds=0.0,
        mesh=make_mesh(min(8, jax.device_count())),
    )
    assert srv.drain() == (1, 0)
    seg = os.path.join(
        str(tmp_path / "out"), "002_Segmentations", "003_postproc_fov",
        "mesh_case.nii.gz",
    )
    assert nifti.try_load_nifti(seg)


def test_resubmission_while_in_flight_not_clobbered(served):
    """A same-name request arriving while the case is claimed must NOT be
    renamed over the in-flight claim (which would swap its input and lose
    the new request) — it stays in the spool until the claim clears."""
    srv, spool, out, *_ = served
    claimed = None
    try:
        spool_request(spool, "caseC", seed=2)
        claimed = srv.claim_one()
        assert claimed is not None and claimed[0] == "caseC"
        # resubmission lands while caseC is in flight
        spool_request(spool, "caseC", seed=3)
        assert srv.claim_one() is None  # skipped, NOT clobbered
        assert os.path.isfile(os.path.join(spool, "caseC.nii.gz"))
        assert os.path.isfile(claimed[1])  # in-flight claim untouched
    finally:
        # clean up both so later fixture assertions see an empty spool
        if claimed:
            os.remove(claimed[1])
        os.remove(os.path.join(spool, "caseC.nii.gz"))


def test_changed_resubmission_recomputes(served):
    """Resubmitting a case with DIFFERENT bytes recomputes instead of
    serving the old segmentation through the artifact resume probes; the
    receipt records the input hash."""
    srv, spool, out, *_ = served
    receipt_path = os.path.join(spool, ".done", "caseA.json")
    sha0 = json.load(open(receipt_path))["input_sha256"]
    pre = os.path.join(out, "001_Preprocessed_Images", "caseA_0000.nii.gz")
    old_pre = nifti.load_nifti_simple(pre)

    # identical resubmission: acknowledged without clearing artifacts
    spool_request(spool, "caseA", seed=0)
    srv.drain()
    assert json.load(open(receipt_path))["input_sha256"] == sha0

    # changed resubmission: artifacts recomputed from the new bytes
    spool_request(spool, "caseA", seed=7)
    srv.drain()
    r = json.load(open(receipt_path))
    assert r["input_sha256"] != sha0
    new_pre = nifti.load_nifti_simple(pre)
    # skip_bfc: pre IS the input volume, so it must now differ
    assert not np.allclose(old_pre, new_pre)
    np.testing.assert_allclose(new_pre, head_volume(seed=7), atol=1e-4)


def test_respool_never_clobbers_newer_submission(served):
    """recover_work/_unclaim/recover_stale route through _respool: a claim
    returning to the spool must NOT replace a newer resubmission's bytes —
    the old claim is superseded and dropped."""
    srv, spool, out, *_ = served
    import shutil

    spool_request(spool, "caseD", seed=4)
    claimed = srv.claim_one()
    assert claimed[0] == "caseD"
    # newer submission lands while claimed
    spool_request(spool, "caseD", seed=5)
    newer = open(os.path.join(spool, "caseD.nii.gz"), "rb").read()
    assert srv._respool(claimed[1]) is False  # superseded, dropped
    assert not os.path.exists(claimed[1])
    assert open(os.path.join(spool, "caseD.nii.gz"), "rb").read() == newer
    # no conflict: respool restores the claim
    claimed2 = (srv.claim_one() or (None, None))
    assert claimed2[0] == "caseD"
    assert srv._respool(claimed2[1]) is True
    os.remove(os.path.join(spool, "caseD.nii.gz"))


def test_inflight_guard_covers_other_servers(served, tmp_path):
    """A resubmission is not claimable while ANY server holds the case —
    two servers must never compute one case concurrently on different
    bytes."""
    srv, spool, out, *_ = served
    other = os.path.join(spool, ".work", "other-srv")
    os.makedirs(other, exist_ok=True)
    try:
        spool_request(spool, "caseE", seed=6)
        # simulate another server's in-flight claim of caseE
        open(os.path.join(other, "caseE.nii.gz"), "wb").write(b"x")
        assert srv.claim_one() is None
        os.remove(os.path.join(other, "caseE.nii.gz"))
        claimed = srv.claim_one()
        assert claimed[0] == "caseE"
        os.remove(claimed[1])
    finally:
        os.rmdir(other)
        p = os.path.join(spool, "caseE.nii.gz")
        if os.path.exists(p):
            os.remove(p)


def test_changed_resubmission_invalidates_receipt_first(served):
    """While a changed resubmission recomputes, no receipt exists (a
    consumer must never hold a receipt whose artifacts are being
    replaced); unknown provenance (receipt without sha) also recomputes."""
    srv, spool, out, *_ = served
    receipt = os.path.join(spool, ".done", "caseB.json")
    assert os.path.isfile(receipt)
    # strip the sha -> unknown provenance -> recompute path
    r = json.load(open(receipt))
    del r["input_sha256"]
    json.dump(r, open(receipt, "w"))
    spool_request(spool, "caseB", seed=1)
    srv.drain()
    r2 = json.load(open(receipt))
    assert "input_sha256" in r2  # re-stamped by the recompute


def test_save_nifti_is_atomic(tmp_path):
    """Artifact writes go through tmp+os.replace and leave no temp files —
    a reader can never observe a torn volume (RELIABILITY.md)."""
    hdr = nifti.NiftiHeader()
    hdr.set_shape((4, 4, 4))
    p = str(tmp_path / "x.nii.gz")
    nifti.save_nifti(np.ones((4, 4, 4), np.float32), hdr, p)
    assert nifti.try_load_nifti(p)
    assert [f for f in os.listdir(tmp_path) if ".tmp-" in f] == []


def test_stop_mid_drain_unclaims_prefetched(served):
    """STOP arriving while a case computes: the in-flight case finishes,
    the already-claimed (prefetched) next request goes back to the spool."""
    srv, spool, out, *_ = served
    srv.batch_max = 1  # prefetch/unclaim semantics are the per-case path's
    spool_request(spool, "caseG", seed=6)
    spool_request(spool, "caseH", seed=7)
    stop = os.path.join(spool, "STOP")
    orig = srv.process

    def process_and_stop(case, path, **kw):
        open(stop, "w").close()
        return orig(case, path, **kw)

    srv.process = process_and_stop
    try:
        result = srv.drain()
    finally:
        srv.process = orig
        os.remove(stop)
    assert result == (1, 0)
    # the second request is back in the spool, claimable again
    pending = sorted(f for f in os.listdir(spool) if case_name_of(f))
    assert len(pending) == 1
    assert srv.drain() == (1, 0)


def test_settle_guard_skips_fresh_files(served):
    """A file whose mtime is newer than settle_seconds (e.g. still being
    cp'd into the spool) is not claimable until it settles."""
    srv, spool, out, *_ = served
    spool_request(spool, "caseI", seed=8)
    srv.settle_seconds = 3600.0
    try:
        assert srv.claim_one() is None
        os.utime(os.path.join(spool, "caseI.nii.gz"), (1, 1))  # long settled
        claimed = srv.claim_one()
        assert claimed is not None and claimed[0] == "caseI"
        os.rename(claimed[1], os.path.join(spool, "caseI.nii.gz"))
    finally:
        srv.settle_seconds = 0.0
    assert srv.drain() == (1, 0)


def test_stale_claim_recovery(served):
    """Requests stranded in a DEAD server's work dir are re-spooled by any
    other server once the dead id's heartbeat is stale; a live id's claims
    are left alone."""
    srv, spool, out, *_ = served
    dead_work = os.path.join(spool, ".work", "deadsrv")
    os.makedirs(dead_work, exist_ok=True)
    spool_request(spool, "caseJ", seed=10)
    os.rename(os.path.join(spool, "caseJ.nii.gz"),
              os.path.join(dead_work, "caseJ.nii.gz"))

    # a FRESH heartbeat protects the claim
    status = os.path.join(spool, ".status", "deadsrv.json")
    open(status, "w").write("{}")
    assert srv.recover_stale(stale_after=3600.0) == 0
    assert os.path.isfile(os.path.join(dead_work, "caseJ.nii.gz"))

    # a stale heartbeat releases it
    os.utime(status, (1, 1))
    assert srv.recover_stale(stale_after=3600.0) == 1
    assert srv.drain() == (1, 0)

    # claiming freshens our own heartbeat (liveness while busy)
    own = os.path.join(spool, ".status", srv.server_id + ".json")
    os.utime(own, (1, 1))
    spool_request(spool, "caseK", seed=11)
    claimed = srv.claim_one()
    assert claimed is not None
    import time as _t

    assert _t.time() - os.path.getmtime(own) < 60
    os.rename(claimed[1], os.path.join(spool, "caseK.nii.gz"))
    assert srv.drain() == (1, 0)


def test_serve_cli_rejects_mesh_with_device(tmp_path):
    from deepwmh_tpu.cli.serve import main

    with pytest.raises(SystemExit) as e:
        main(["-m", "x", "-s", str(tmp_path), "-o", str(tmp_path / "o"),
              "--mesh", "--device", "0", "--once"])
    assert e.value.code == 2  # argparse error exit


def test_two_servers_share_one_spool(tmp_path):
    """Two live servers over one spool split the work with exactly-once
    semantics (the multi-chip throughput topology)."""
    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    for i in range(4):
        spool_request(spool, "case%d" % i, seed=20 + i)
    out = str(tmp_path / "out")
    a = SpoolServer(spool, out, model_dir, skip_bfc=True, tta=False,
                    make_previews=False, server_id="a", settle_seconds=0.0)
    b = SpoolServer(spool, out, model_dir, skip_bfc=True, tta=False,
                    make_previews=False, server_id="b", settle_seconds=0.0)
    # interleave claims: each request is claimed by exactly one server
    total = 0
    while True:
        worked = False
        for srv in (a, b):
            claimed = srv.claim_one()
            if claimed:
                srv.process(*claimed)
                total += 1
                worked = True
        if not worked:
            break
    assert total == 4
    assert a.served + b.served == 4 and a.served >= 1 and b.served >= 1
    done = sorted(os.listdir(os.path.join(spool, ".done")))
    assert done == ["case%d.json" % i for i in range(4)]


def test_burst_batching_contract(tmp_path):
    """Same-geometry requests pending together run as ONE vmapped program
    (receipts carry burst_size); a different-geometry request in the same
    drain runs per-case. Outputs match the one-case path bit-for-bit."""
    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    for i in range(3):
        spool_request(spool, "same%d" % i, seed=i)
    # one request on a different grid
    hdr = nifti.NiftiHeader()
    hdr.set_shape((20, 24, 20))
    hdr.set_zooms((2.0, 2.0, 2.0))
    nifti.save_nifti(head_volume((20, 24, 20), seed=9), hdr,
                     os.path.join(spool, "odd.nii.gz"))

    srv = SpoolServer(
        spool, str(tmp_path / "out"), model_dir,
        skip_bfc=True, tta=False, make_previews=False, server_id="burst",
        settle_seconds=0.0, batch_max=8,
    )
    served, failed = srv.drain()
    assert (served, failed) == (4, 0)
    for i in range(3):
        r = json.load(open(os.path.join(spool, ".done", "same%d.json" % i)))
        assert r.get("burst_size") == 3, r
    r = json.load(open(os.path.join(spool, ".done", "odd.json")))
    assert "burst_size" not in r

    # bit-equivalence with the one-case path on the same input
    single = SpoolServer(
        spool, str(tmp_path / "out_single"), model_dir,
        skip_bfc=True, tta=False, make_previews=False, server_id="single",
        settle_seconds=0.0, batch_max=1,
    )
    spool_request(spool, "same0", seed=0)  # resubmit the identical bytes
    assert single.drain() == (1, 0)
    a = nifti.load_nifti_simple(os.path.join(
        str(tmp_path / "out"), "002_Segmentations", "003_postproc_fov",
        "same0.nii.gz"))
    b = nifti.load_nifti_simple(os.path.join(
        str(tmp_path / "out_single"), "002_Segmentations", "003_postproc_fov",
        "same0.nii.gz"))
    assert np.array_equal(a, b)


def test_burst_failure_degrades_to_per_case(tmp_path):
    """A burst-level program failure must not fail the requests: each runs
    through the per-case path (and only genuinely bad inputs quarantine)."""
    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    spool_request(spool, "x0", seed=0)
    spool_request(spool, "x1", seed=1)
    srv = SpoolServer(
        spool, str(tmp_path / "out"), model_dir,
        skip_bfc=True, tta=False, make_previews=False, server_id="bf",
        settle_seconds=0.0, batch_max=4,
    )

    def boom(*a, **kw):
        raise RuntimeError("burst compile failed")

    srv.predictor.predict_case_full_batch = boom
    assert srv.drain() == (2, 0)
    for case in ("x0", "x1"):
        assert os.path.isfile(os.path.join(spool, ".done", "%s.json" % case))


def test_batch_max_default_policy(tmp_path):
    """The default burst policy is the MEASURED one (docs/PERF.md serving
    burst study): single chip serves per-case (within-device vmap batching
    of the fused case program is a 0.5-0.75x loss), a mesh bursts one case
    per device (capped at the mesh size); an explicit value overrides the
    single-chip default."""
    from deepwmh_tpu.parallel.mesh import make_mesh

    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    single = SpoolServer(
        spool, str(tmp_path / "o1"), model_dir, skip_bfc=True, tta=False,
        make_previews=False, server_id="p1", settle_seconds=0.0,
    )
    assert single.batch_max == 1
    override = SpoolServer(
        spool, str(tmp_path / "o2"), model_dir, skip_bfc=True, tta=False,
        make_previews=False, server_id="p2", settle_seconds=0.0, batch_max=4,
    )
    assert override.batch_max == 4
    if jax.device_count() >= 2:
        n = min(8, jax.device_count())
        mesh = make_mesh(n)
        meshed = SpoolServer(
            spool, str(tmp_path / "o3"), model_dir, skip_bfc=True, tta=False,
            make_previews=False, server_id="p3", settle_seconds=0.0, mesh=mesh,
        )
        assert meshed.batch_max == n
        capped = SpoolServer(
            spool, str(tmp_path / "o4"), model_dir, skip_bfc=True, tta=False,
            make_previews=False, server_id="p4", settle_seconds=0.0, mesh=mesh,
            batch_max=99,
        )
        assert capped.batch_max == n


def test_mesh_dp_burst(tmp_path):
    """Under a mesh, a same-geometry burst runs data-parallel — one case
    per device through the sharded predictor's dp-burst program (the batch
    axis sharded over devices; B=3 pads to the mesh size and the padding
    is dropped). Receipts carry burst_size and outputs match the
    single-chip per-case path."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from deepwmh_tpu.parallel.mesh import make_mesh

    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    for i in range(3):
        spool_request(spool, "dp%d" % i, seed=i)
    srv = SpoolServer(
        spool, str(tmp_path / "out"), model_dir,
        skip_bfc=True, tta=True, make_previews=False, server_id="dpb",
        settle_seconds=0.0, mesh=make_mesh(min(8, jax.device_count())),
    )
    assert srv.drain() == (3, 0)
    for i in range(3):
        r = json.load(open(os.path.join(spool, ".done", "dp%d.json" % i)))
        assert r.get("burst_size") == 3, r

    # agreement with the single-chip per-case path on identical bytes
    single = SpoolServer(
        spool, str(tmp_path / "out_single"), model_dir,
        skip_bfc=True, tta=True, make_previews=False, server_id="dps",
        settle_seconds=0.0,
    )
    spool_request(spool, "dp0", seed=0)
    assert single.drain() == (1, 0)
    a = nifti.load_nifti_simple(os.path.join(
        str(tmp_path / "out"), "002_Segmentations", "003_postproc_fov",
        "dp0.nii.gz"))
    b = nifti.load_nifti_simple(os.path.join(
        str(tmp_path / "out_single"), "002_Segmentations", "003_postproc_fov",
        "dp0.nii.gz"))
    assert np.array_equal(a, b)


@pytest.mark.slow
def test_serve_forever_soak(tmp_path):
    """Reliability under SEQUENCE, not per-feature units: one long-lived
    serve_forever loop (daemon thread) while the spool receives waves of
    requests mid-flight, a corrupt input mid-stream, a changed
    resubmission, and finally STOP while work is still arriving. Invariants
    at the end: the loop exits on its own, every valid request ends in
    exactly one receipt + loadable segmentation, the corrupt one is
    quarantined with a traceback, the post-STOP leftovers are still intact
    requests in the spool (unclaimed — nothing lost), and the status file
    agrees with the receipt count. Backs docs/RELIABILITY.md's claims as a
    sequence test (pipeline/serve.py:530-581)."""
    import threading
    import time as _time

    model_dir = tiny_model_dir(tmp_path)
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    os.makedirs(spool)

    srv = SpoolServer(
        spool, out, model_dir,
        skip_bfc=True, tta=False, make_previews=False, server_id="soak",
        settle_seconds=0.0, poll_interval=0.1,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    def wait_receipts(n, timeout=300.0):
        t0 = _time.time()
        done = os.path.join(spool, ".done")
        while _time.time() - t0 < timeout:
            if os.path.isdir(done) and len(
                [f for f in os.listdir(done) if f.endswith(".json")]
            ) >= n:
                return
            _time.sleep(0.2)
        raise AssertionError("timed out waiting for %d receipts" % n)

    # wave 1: two requests land together
    spool_request(spool, "w1a", seed=0)
    spool_request(spool, "w1b", seed=1)
    wait_receipts(1)
    # wave 2 arrives while wave 1 may still be mid-flight: a corrupt
    # input between two valid ones
    spool_request(spool, "w2a", seed=2)
    with open(os.path.join(spool, "rotten.nii.gz"), "wb") as f:
        f.write(b"NOT A NIFTI")
    spool_request(spool, "w2b", seed=3)
    wait_receipts(4)  # w1a w1b w2a w2b (rotten -> .failed, no receipt)

    # changed resubmission of an already-served case must recompute (the
    # served counter ticks a 5th time; provenance tests elsewhere pin that
    # the receipt's input_sha flips to the new bytes)
    spool_request(spool, "w1a", seed=42)
    t0 = _time.time()
    while srv.served < 5 and _time.time() - t0 < 300:
        _time.sleep(0.2)
    assert srv.served >= 5, "changed resubmission was not recomputed"

    # final wave + STOP racing the drain: the loop must finish the case it
    # is on, unclaim anything prefetched, and exit on its own
    spool_request(spool, "w3a", seed=4)
    spool_request(spool, "w3b", seed=5)
    open(os.path.join(spool, "STOP"), "w").close()
    t.join(timeout=300)
    assert not t.is_alive(), "serve_forever did not exit after STOP"

    # invariants
    receipts = {
        f[:-5] for f in os.listdir(os.path.join(spool, ".done"))
        if f.endswith(".json")
    }
    leftovers = {
        case_name_of(f)[0] for f in os.listdir(spool) if case_name_of(f)
    }
    # every valid request is exactly-once: receipt XOR still-spooled
    for case in ("w1a", "w1b", "w2a", "w2b", "w3a", "w3b"):
        assert (case in receipts) ^ (case in leftovers), (
            case, receipts, leftovers)
    for case in receipts:
        seg = os.path.join(out, "002_Segmentations", "003_postproc_fov",
                           case + ".nii.gz")
        assert nifti.try_load_nifti(seg), seg
    # corrupt input quarantined, not retried forever, no receipt
    assert os.path.isfile(os.path.join(spool, ".failed", "rotten.nii.gz"))
    assert "Traceback" in open(
        os.path.join(spool, ".failed", "rotten.err")).read()
    assert "rotten" not in receipts
    # nothing stuck in the server's work dir after exit
    assert os.listdir(os.path.join(spool, ".work", "soak")) == []
    # status agrees with the walk: serves = receipts written by this run,
    # fails = the corrupt one
    status = json.load(open(os.path.join(spool, ".status", "soak.json")))
    assert status["failed"] == 1
    assert status["served"] == srv.served >= 5

    # post-STOP leftovers are intact requests: a fresh --once drain after
    # STOP removal serves them (restart-recovery completes the story)
    os.remove(os.path.join(spool, "STOP"))
    if leftovers:
        srv2 = SpoolServer(
            spool, out, model_dir,
            skip_bfc=True, tta=False, make_previews=False,
            server_id="soak2", settle_seconds=0.0,
        )
        ok, bad = srv2.drain()
        assert ok == len(leftovers) and bad == 0
