"""Per-case inference pipeline: N4 → U-Net sweep → 3 mm postproc → brain
FOV mask → GIF preview, with the reference's artifact layout and resume
semantics (deepwmh/main/predict.py:109-192).

Shared by the batch CLI (cli/predict.py) and the serving loop
(pipeline/serve.py). A FRESH case (no artifacts yet — every serve request,
and the common batch case) runs the whole device pipeline as ONE fused
program (CaseProgramMixin.predict_case_full): one dispatch instead of
four and no intermediate artifact reloads. A partially-computed case
falls back to the stage-by-stage path so resume granularity is unchanged.
"""

from __future__ import annotations

import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.artifacts import join_path, mkdir


def make_output_folders(output_folder):
    """Create the reference's output layout; returns a dict of the five
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


def _can_fuse(shape, skip_bfc) -> bool:
    """The fused program runs N4 single-device (replicated under a mesh);
    volumes the auto router would slab-shard keep the staged path. Shares
    the ROUTER'S OWN predicate so the two can never diverge (a fresh case
    and a resumed case must produce the same pre artifact)."""
    from deepwmh_tpu.ops.n4 import n4_would_shard

    return skip_bfc or not n4_would_shard(shape)


def predict_batch_cases(
    predictor,
    cases,
    folders,
    skip_bfc: bool = False,
    make_previews: bool = True,
    preloads: dict | None = None,
):
    """A BURST of same-geometry cases through ONE vmapped fused program
    (CaseProgramMixin.predict_case_full_batch) — the serving burst path.

    cases: list of (case, image_path), all sharing volume shape AND spacing
    (the caller buckets; asserted here). preloads: {case: (data, hdr)}
    already decoded. Cases that are not fresh (existing artifacts: resume
    semantics demand the staged path) or not fuseable run individually via
    predict_one_case. Per-case artifacts and previews are identical to the
    one-case path. Returns {case: seg_fov_path}."""
    import jax.numpy as jnp

    preloads = dict(preloads or {})
    batch, solo = [], []
    for case, image_path in cases:
        paths = [
            join_path(folders["images"], "%s_0000.nii.gz" % case),
            join_path(folders["raw"], "%s.nii.gz" % case),
            join_path(folders["post_3mm"], "%s.nii.gz" % case),
            join_path(folders["post_fov"], "%s.nii.gz" % case),
        ]
        if case not in preloads:
            preloads[case] = nifti.load_nifti(image_path)
        data, hdr = preloads[case]
        if any(nifti.try_load_nifti(p) for p in paths) or not _can_fuse(
            data.shape, skip_bfc
        ):
            solo.append((case, image_path))
        else:
            batch.append((case, image_path, data, hdr))

    out = {}
    if len(batch) >= 2:
        shapes = {d.shape for _, _, d, _ in batch}
        zooms = {tuple(round(float(z), 4) for z in h.zooms[:3])
                 for _, _, _, h in batch}
        assert len(shapes) == 1 and len(zooms) == 1, (
            "burst cases must share geometry: shapes=%s zooms=%s"
            % (shapes, zooms))
        spacing = [abs(z) for z in next(iter(zooms))]
        stack = jnp.stack([jnp.asarray(d, jnp.float32) for _, _, d, _ in batch])
        try:
            pre_b, seg_b, s3_b, fov_b, _fg_b = predictor.predict_case_full_batch(
                stack, spacing, apply_n4=not skip_bfc
            )
            for i, (case, image_path, data, hdr) in enumerate(batch):
                pre_path = join_path(folders["images"], "%s_0000.nii.gz" % case)
                raw_seg = join_path(folders["raw"], "%s.nii.gz" % case)
                seg_3mm = join_path(folders["post_3mm"], "%s.nii.gz" % case)
                seg_fov = join_path(folders["post_fov"], "%s.nii.gz" % case)
                nifti.save_nifti(np.asarray(pre_b[i]), hdr, pre_path)
                nifti.save_nifti(np.asarray(seg_b[i]), hdr, raw_seg)
                nifti.save_nifti(np.asarray(s3_b[i]), hdr, seg_3mm)
                fov_np = np.asarray(fov_b[i])
                nifti.save_nifti(fov_np, hdr, seg_fov)
                out[case] = seg_fov
                if make_previews:
                    _render_preview(folders, case, data, fov_np)
        except Exception as e:
            # the batch is an optimization, never a correctness boundary:
            # any failure degrades to the per-case path (which quarantines
            # individually in serving)
            print("burst of %d failed (%r); falling back to per-case"
                  % (len(batch), e), flush=True)
            solo.extend((case, p) for case, p, _, _ in batch)
    else:
        solo.extend((case, p) for case, p, _, _ in batch)

    for case, image_path in solo:
        out[case] = predict_one_case(
            predictor, case, image_path, folders,
            skip_bfc=skip_bfc, make_previews=make_previews,
            preloaded=preloads.get(case),
        )
    return out


def _render_preview(folders, case, raw_data, fov_data,
                    image_path=None, seg_path=None):
    """Best-effort GIF preview: a rendering error must never fail a case
    whose segmentation artifacts are already complete on disk (same policy
    as the stage-1 histogram plots, analysis.py). raw_data/fov_data may be
    None when image_path/seg_path are given — loaded lazily, and only if
    the GIF is actually missing."""
    from deepwmh_tpu.eval.preview import nii_as_gif, nii_slice_range, try_load_gif

    out_gif = join_path(folders["previews"], "%s.gif" % case)
    try:
        if not try_load_gif(out_gif):
            data = (raw_data if raw_data is not None
                    else nifti.load_nifti_simple(image_path))
            seg = (fov_data if fov_data is not None
                   else nifti.load_nifti_simple(seg_path))
            s0, s1 = nii_slice_range(data, axis="axial")
            nii_as_gif(
                data, out_gif, axis="axial", lesion_mask=seg,
                side_by_side=True, slice_range=(s0, s1),
            )
    except Exception as e:
        print("warning: preview rendering failed for %s: %r" % (case, e),
              flush=True)


def predict_one_case(
    predictor,
    case,
    image_path,
    folders,
    skip_bfc: bool = False,
    make_previews: bool = True,
    preloaded=None,
):
    """One case through the full inference path with a warm predictor;
    every artifact is loadability-probed so re-running resumes. See the
    module docstring for the fused fresh-case fast path.

    preloaded: optional (data, hdr) for image_path, already loaded — the
    serving loop prefetches the next request's IO while the current one
    computes and passes it here."""
    import jax.numpy as jnp

    from deepwmh_tpu.ops.brain import brain_extract
    from deepwmh_tpu.ops.components import remove_3mm_sparks
    from deepwmh_tpu.ops.n4 import n4_bias_correction_auto

    pre_path = join_path(folders["images"], "%s_0000.nii.gz" % case)
    raw_seg = join_path(folders["raw"], "%s.nii.gz" % case)
    seg_3mm = join_path(folders["post_3mm"], "%s.nii.gz" % case)
    seg_fov = join_path(folders["post_fov"], "%s.nii.gz" % case)

    raw_data = None
    fov_data = None
    # (data, hdr) for image_path, reused by whichever path runs — the serve
    # prefetch's decode must help the staged fallback too, not just the
    # fused branch
    loaded = preloaded
    fused = not any(
        nifti.try_load_nifti(p) for p in (pre_path, raw_seg, seg_3mm, seg_fov)
    )
    if fused:
        if loaded is None:
            loaded = nifti.load_nifti(image_path)
        data, hdr = loaded
        if not _can_fuse(data.shape, skip_bfc):
            fused = False
        else:
            raw_data = data
            spacing = [float(abs(z)) for z in hdr.zooms[:3]]
            pre, seg, s3, fov, _fg = predictor.predict_case_full(
                data, spacing, apply_n4=not skip_bfc
            )
            fov_data = np.asarray(fov)
            nifti.save_nifti(np.asarray(pre), hdr, pre_path)
            nifti.save_nifti(np.asarray(seg), hdr, raw_seg)
            nifti.save_nifti(np.asarray(s3), hdr, seg_3mm)
            nifti.save_nifti(fov_data, hdr, seg_fov)

    if not fused:
        # stage-by-stage path: resume granularity = one artifact
        if not nifti.try_load_nifti(pre_path):
            # reuse the volume the fused gate (or the serve prefetch)
            # already decoded — on the biggest inputs, where this path is
            # taken, a second gzip decode is the most expensive
            data, hdr = loaded if loaded is not None else nifti.load_nifti(image_path)
            raw_data = data
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
        _render_preview(folders, case, raw_data, fov_data,
                        image_path=image_path, seg_path=seg_fov)
    return seg_fov
