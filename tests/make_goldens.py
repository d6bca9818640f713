"""Regenerate the forward-path golden outputs (tests/goldens/forward.npz).

Run manually after an INTENTIONAL semantics change:
    JAX_PLATFORMS=cpu python tests/make_goldens.py
The goldens anchor the rasterizer forward across rounds: they were validated
against the brute-force oracle (test_forward_matches_brute) at generation
time, so any later drift is a regression, not a re-derivation.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build(seed=7, n=120, W=48, H=32):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from instascene_tpu.cameras import Camera
    from instascene_tpu.data.synthetic import look_at
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    rng = np.random.default_rng(seed)
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="g", width=W, height=H)
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.0, 0.4, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.98, n).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extra = rng.normal(size=(n, 4)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cfg = RasterizeConfig(width=W, height=H, chunk=16, pair_cap=8192,
                          tile_cap=256, impl="xla")
    out = rasterize(jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
                    jnp.asarray(opac), cm, bg, cfg,
                    colors=jnp.asarray(color), extras=jnp.asarray(extra))
    b = out.blend
    return dict(seed=seed, n=n, W=W, H=H,
                inputs_xyz=xyz, inputs_scales=scales, inputs_rots=rots,
                inputs_opac=opac, inputs_color=color, inputs_extra=extra,
                color=np.asarray(b.color), depth=np.asarray(b.depth),
                alpha=np.asarray(b.alpha), normal=np.asarray(b.normal),
                median_depth=np.asarray(b.median_depth),
                distortion=np.asarray(b.distortion),
                extra=np.asarray(b.extra), final_T=np.asarray(b.final_T),
                n_contrib=np.asarray(b.n_contrib))


if __name__ == "__main__":
    g = build()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens", "forward.npz")
    np.savez_compressed(out, **g)
    print(f"wrote {out} color_mean={g['color'].mean():.6f}")
