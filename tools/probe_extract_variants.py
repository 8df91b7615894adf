"""Extraction one-hot reduce variants, composed-loop timing.

Current _extract_block does 4 separate masked 32-lane one-hot reduces of
the gathered (2m, 128) rows. Candidates:
  v0  current (4 quarter reduces, mask fused into each)
  v1  one 128-lane select (lane % 32 == slot) then 4 quarter sums of the
      selected copy
  v2  one 128-lane select then (2m, 4, 32) reshape + minor-axis sum

Run ON TPU: PYTHONPATH=$PYTHONPATH:/root/repo python tools/probe_extract_variants.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def variant_block(shadow, cr, init_value, fill_value, mode):
    """Drop-in _extract_block replacement (monkeypatched into rowvol so
    extract_rows' ray chunking still applies)."""
    from segfusion_tpu.ops import rowvol as rv

    n, p = cr.ksl.shape
    m = n * p
    rows = jnp.take(shadow, cr.k_rows.reshape(-1), axis=0)
    slf = cr.ksl.reshape(-1)
    sl2 = jnp.concatenate([slf, slf])[:, None]

    if mode == 0:
        iota = jax.lax.broadcasted_iota(jnp.int32, (2 * m, 32), 1)
        hot = iota == sl2

        def quarter(lo):
            return jnp.sum(
                jnp.where(hot, rows[:, lo:lo + 32], jnp.uint32(0)), axis=-1)

        qA0, qA1, qB0, qB1 = (quarter(0), quarter(32), quarter(64),
                              quarter(96))
    elif mode == 1:
        iota = jax.lax.broadcasted_iota(jnp.int32, (2 * m, 128), 1)
        hot = (iota & 31) == sl2
        sel = jnp.where(hot, rows, jnp.uint32(0))
        qA0 = jnp.sum(sel[:, 0:32], axis=-1)
        qA1 = jnp.sum(sel[:, 32:64], axis=-1)
        qB0 = jnp.sum(sel[:, 64:96], axis=-1)
        qB1 = jnp.sum(sel[:, 96:128], axis=-1)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (2 * m, 128), 1)
        hot = (iota & 31) == sl2
        sel = jnp.where(hot, rows, jnp.uint32(0))
        q = jnp.sum(sel.reshape(2 * m, 4, 32), axis=-1)
        qA0, qA1, qB0, qB1 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]

    # tail identical to rowvol._extract_block
    dz0 = cr.dz0.reshape(-1)
    dz1 = cr.dz1.reshape(-1)
    vz0 = cr.vz0.reshape(-1)
    vz1 = cr.vz1.reshape(-1)
    wz0 = cr.wz0.reshape(-1)
    wz1 = cr.wz1.reshape(-1)
    vyA = cr.vyA.reshape(-1)
    vyB = cr.vyB.reshape(-1)
    wyA = cr.wyA.reshape(-1)
    wyB = cr.wyB.reshape(-1)

    def column(q0, q1, vx, vy, wy):
        g0 = jnp.where(dz0 == 0, q0, q1)
        g1 = jnp.where(dz1 == 0, q0, q1)
        n0, w0 = rv._unpack(g0)
        n1, w1 = rv._unpack(g1)

        def corner(nc, wc, vz):
            v = jnp.where(wc > 0, nc / jnp.maximum(wc, 1e-12),
                          jnp.float32(init_value))
            valid = vx & vy & vz
            return (jnp.where(valid, v, jnp.float32(fill_value)),
                    jnp.where(valid, wc, 0.0))

        v0, fw0 = corner(n0, w0, vz0)
        v1, fw1 = corner(n1, w1, vz1)
        return (wy * (wz0 * v0 + wz1 * v1),
                wy * (wz0 * fw0 + wz1 * fw1))

    fv = fw = 0.0
    for c in range(2):
        vx_c = cr.vx[c].reshape(-1)
        wx_c = cr.wx[c].reshape(-1)
        vA, wA = column(qA0[c * m:(c + 1) * m], qA1[c * m:(c + 1) * m],
                        vx_c, vyA, wyA)
        vB, wB = column(qB0[c * m:(c + 1) * m], qB1[c * m:(c + 1) * m],
                        vx_c, vyB, wyB)
        fv = fv + wx_c * (vA + vB)
        fw = fw + wx_c * (wA + wB)
    fv = fv + (1.0 - wyA - wyB) * jnp.float32(fill_value)
    return fv.reshape(n, p), fw.reshape(n, p)


def main():
    import bench as B
    from segfusion_tpu.core.volume import init_scene_volume
    from segfusion_tpu.data.synthetic import SyntheticScene
    from segfusion_tpu.ops import geometry, rowvol

    h = w = 256
    n_points = 9
    scene = SyntheticScene(seed=0, half=2.2)
    vshape = (448, 448, 448)
    origin = np.array([-2.24, -2.24, -2.24], np.float32)
    volume = init_scene_volume(vshape, origin, 0.01, 0.1)
    L = rowvol.RowLayout.for_shape(vshape)
    print("rendering frames...", flush=True)
    frames = B.render_frames(scene, h, w, 8)
    geo, _ = rowvol.rows_from_volume(volume.num, volume.weights,
                                     volume.semkey, L)
    org = jnp.asarray(origin)
    res = jnp.float32(0.01)

    @jax.jit
    def all_cr(frames):
        def one(frame):
            pw = geometry.unproject(frame["depth"], frame["extrinsics"],
                                    frame["intrinsics"])
            eye = frame["extrinsics"][:3, 3].astype(jnp.float32)
            pv, _ = geometry.sample_ray_points(pw, eye, org, res, n_points)
            return rowvol.corner_rows(pv, L)
        return jax.vmap(one)(frames)

    crs = all_cr(frames)
    crs = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), crs)
    T = 32
    shadow = rowvol.build_shadow(geo, L)
    # salt the shadow per iteration so the gather's source has a carry
    # dependency (prevents hoisting); one cheap elementwise xor per frame
    orig_block = rowvol._extract_block

    def runner(mode):
        if mode < 0:
            rowvol._extract_block = orig_block
            rowvol.GATHER_DEDUP = (mode == -2)
        else:
            rowvol._extract_block = (
                lambda sh, cr, iv, fl: variant_block(sh, cr, iv, fl, mode))

        @jax.jit
        def f(shadow, crs):
            def body(carry, cr):
                acc, sh = carry
                fv, fw = rowvol.extract_rows(sh, cr, 0.1,
                                             geometry.INVALID_TSDF_FILL)
                sh = sh ^ jnp.uint32(1)
                return (acc + jnp.sum(fv) + jnp.sum(fw), sh), None
            (acc, sh), _ = jax.lax.scan(body, (jnp.float32(0), shadow),
                                        crs)
            return acc + jnp.float32(jnp.sum(sh[::65536, ::64]))
        out = f(shadow, crs)   # trace with the patch active
        rowvol._extract_block = orig_block
        rowvol.GATHER_DEDUP = False
        return f, out

    ref = None
    for mode, name in ((-1, "extract_rows(now)"), (0, "v0 4-quarter"),
                       (1, "v1 one-select"), (2, "v2 reshape-sum"),
                       (-2, "dedup-gather")):
        fn, out = runner(mode)
        out = float(out)
        if ref is None:
            ref = out
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(shadow, crs))
            best = min(best, time.perf_counter() - t0)
        ok = "" if abs(out - ref) <= abs(ref) * 1e-5 else "  MISMATCH"
        print(f"{name:20s}: {best / T * 1e3:7.2f} ms/frame{ok}",
              flush=True)


if __name__ == "__main__":
    main()
