"""Data layer tests: COLMAP parsers, PLY I/O, camera matrices, scene assembly."""

import math
import os

import numpy as np
import pytest

from instascene_tpu.cameras import (Camera, get_projection_matrix,
                                    get_world2view, ndc2pix_matrix)
from instascene_tpu.config import ModelParams
from instascene_tpu.data.colmap import (qvec2rotmat, read_cameras_binary,
                                        read_images_binary,
                                        read_points3D_binary, rotmat2qvec)
from instascene_tpu.data.dataset import Scene, read_colmap_scene
from instascene_tpu.data.ply import (read_ply, read_point_cloud, write_ply,
                                     write_point_cloud)
from instascene_tpu.data.synthetic import make_synthetic_scene


def test_qvec_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        q2 = rotmat2qvec(R)
        assert np.allclose(q, q2, atol=1e-8)


def test_colmap_binary_roundtrip(tmp_path):
    xyz, rgb, cams = make_synthetic_scene(str(tmp_path), n_points=100, n_cams=3)
    sparse = str(tmp_path / "sparse/0")
    cameras = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    images = read_images_binary(os.path.join(sparse, "images.bin"))
    pts, colors, _ = read_points3D_binary(os.path.join(sparse, "points3D.bin"))
    assert len(cameras) == 1 and cameras[1].model == "PINHOLE"
    assert len(images) == 3
    assert np.allclose(pts, xyz)
    assert np.array_equal(colors, rgb)
    # extrinsics round-trip
    for i, cam in enumerate(cams):
        im = images[i + 1]
        assert np.allclose(qvec2rotmat(im.qvec), cam["R_w2c"], atol=1e-8)
        assert np.allclose(im.tvec, cam["t"], atol=1e-12)


def test_ply_roundtrip(tmp_path, rng):
    n = 50
    arr = np.empty(n, dtype=[("x", "f4"), ("y", "f4"), ("opacity", "f4"),
                             ("red", "u1")])
    arr["x"] = rng.normal(size=n).astype(np.float32)
    arr["y"] = rng.normal(size=n).astype(np.float32)
    arr["opacity"] = rng.normal(size=n).astype(np.float32)
    arr["red"] = rng.integers(0, 255, n).astype(np.uint8)
    p = str(tmp_path / "test.ply")
    write_ply(p, arr)
    back = read_ply(p)["vertex"]
    for name in arr.dtype.names:
        assert np.array_equal(arr[name], back[name]), name
    # header sanity
    with open(p, "rb") as f:
        head = f.read(200).decode("ascii", errors="ignore")
    assert "binary_little_endian" in head
    assert "property float x" in head
    assert "property uchar red" in head


def test_point_cloud_ply(tmp_path, rng):
    xyz = rng.normal(size=(20, 3))
    rgb = rng.random((20, 3))
    p = str(tmp_path / "pc.ply")
    write_point_cloud(p, xyz, rgb)
    pts, colors, normals = read_point_cloud(p)
    assert np.allclose(pts, xyz, atol=1e-6)
    assert np.abs(colors - rgb).max() < 1.0 / 255 + 1e-6
    assert np.allclose(normals, 0)


def test_projection_matrix_conventions():
    """A point on the optical axis at depth z maps to image center; clip w = z."""
    fovx, fovy = 0.9, 0.7
    W, H = 64, 48
    proj = get_projection_matrix(0.01, 100.0, fovx, fovy)
    p_view = np.array([0.0, 0.0, 5.0, 1.0])
    clip = proj @ p_view
    assert np.isclose(clip[3], 5.0)  # w == view z
    ndc = clip[:3] / clip[3]
    assert np.allclose(ndc[:2], 0.0, atol=1e-7)
    # a point at the right frustum edge maps to ndc x == 1
    x_edge = math.tan(fovx / 2) * 5.0
    clip = proj @ np.array([x_edge, 0, 5.0, 1.0])
    assert np.isclose(clip[0] / clip[3], 1.0)
    # ndc2pix: ndc +1 -> pixel W-0.5... check ndc2Pix convention ((v+1)*S-1)/2
    n2p = ndc2pix_matrix(W, H)
    pix = n2p @ np.array([1.0, 0.0, 0.5, 1.0])
    assert np.isclose(pix[0] / pix[2], ((1 + 1) * W - 1) / 2)


def test_world2view_matches_reference_convention(rng):
    """get_world2view(R, t) must equal the reference getWorld2View2 output."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R_w2c = qvec2rotmat(q)
    R = R_w2c.T  # reader convention
    t = rng.normal(size=3)
    w2v = get_world2view(R, t)
    # reference: Rt[:3,:3] = R.T (= R_w2c); Rt[:3,3] = t
    expect = np.eye(4)
    expect[:3, :3] = R_w2c
    expect[:3, 3] = t
    assert np.allclose(w2v, expect, atol=1e-6)
    # camera center: -R_w2c^T t
    cam = Camera(uid=0, colmap_id=0, R=R, T=t, fovx=0.9, fovy=0.7,
                 image_name="x", width=64, height=48)
    assert np.allclose(cam.camera_center, -R_w2c.T @ t, atol=1e-5)


def test_scene_assembly(tmp_path):
    make_synthetic_scene(str(tmp_path / "parent" / "scene"), n_points=100,
                         n_cams=4)
    args = ModelParams(source_path=str(tmp_path / "parent" / "scene"))
    scene = Scene(args, output_root=str(tmp_path / "out"))
    cams = scene.get_train_cameras()
    assert len(cams) == 4
    assert cams[0].image.shape == (48, 64, 3)
    assert cams[0].image.dtype == np.float32
    assert scene.cameras_extent > 0
    assert scene.scene_info.point_cloud.points.shape == (100, 3)
    # eval split: every 8th held out
    args2 = ModelParams(source_path=str(tmp_path / "parent" / "scene"),
                        eval=True)
    info = read_colmap_scene(args2.source_path, "images", True)
    assert len(info.test_cameras) == 1 and len(info.train_cameras) == 3
    # full_proj maps a world point in front of cam 0 into the frustum
    c = cams[0]
    p_world = np.array([0.0, 0.0, 0.0, 1.0])
    clip = c.full_proj @ p_world
    ndc = clip[:3] / clip[3]
    assert np.all(np.abs(ndc[:2]) < 1.0)


def test_sh_eval(rng):
    import jax.numpy as jnp

    from instascene_tpu.ops.sh import (RGB2SH, SH2RGB, eval_sh, eval_sh_np,
                                       sh_to_color)
    rgb = rng.random((5, 3))
    assert np.allclose(SH2RGB(RGB2SH(rgb)), rgb, atol=1e-7)
    sh = rng.normal(size=(5, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(4):
        a = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
        b = eval_sh_np(deg, sh, dirs)
        assert np.allclose(a, b, atol=1e-5), deg
    # deg-0: constant color independent of direction
    c0 = eval_sh_np(0, sh, dirs)
    c0b = eval_sh_np(0, sh, -dirs)
    assert np.allclose(c0, c0b)
    # sh_to_color clamps at 0
    col = np.asarray(sh_to_color(3, jnp.asarray(sh), jnp.zeros((5, 3)) + 1.0,
                                 jnp.zeros(3)))
    assert (col >= 0).all()


def test_config_cli_parity():
    from argparse import ArgumentParser

    from instascene_tpu.config import (OptimizationParams, PipelineParams,
                                       get_combined_args, save_cfg_args)
    parser = ArgumentParser()
    ModelParams.add_to_parser(parser)
    OptimizationParams.add_to_parser(parser)
    PipelineParams.add_to_parser(parser)
    args = parser.parse_args(["-s", "/data/scene", "--iterations", "7000",
                              "--use_seg_feature", "-r", "2"])
    mp = ModelParams.extract(args)
    op = OptimizationParams.extract(args)
    assert mp.source_path == "/data/scene"
    assert mp.resolution == 2
    assert mp.use_seg_feature is True
    assert mp.seg_feat_dim == 16
    assert op.iterations == 7000
    assert op.position_lr_init == 0.00016
    assert op.sample_batchsize == 32 * 1024
    assert op.lambda_3D_contras == 2.5e-6


def test_expon_lr():
    from instascene_tpu.utils.general import get_expon_lr_func
    f = get_expon_lr_func(1e-2, 1e-4, max_steps=100)
    assert np.isclose(f(0), 1e-2)
    assert np.isclose(f(100), 1e-4)
    assert np.isclose(f(50), np.sqrt(1e-2 * 1e-4))
    assert f(-1) == 0.0


def test_build_rotation(rng):
    import jax.numpy as jnp

    from instascene_tpu.utils.general import build_rotation, build_rotation_np
    q = rng.normal(size=(7, 4)).astype(np.float32)
    Rn = build_rotation_np(q)
    Rj = np.asarray(build_rotation(jnp.asarray(q)))
    assert np.allclose(Rn, Rj, atol=1e-5)
    for i in range(7):
        assert np.allclose(Rn[i] @ Rn[i].T, np.eye(3), atol=1e-5)


def test_native_points3d_parser(tmp_path):
    """The C++ points3D.bin walker must agree with the Python fallback and
    beat it on malformed input (returns None, falls back cleanly)."""
    import struct

    from instascene_tpu.data import colmap
    from instascene_tpu.data.native import get_lib, points3d_parse_native

    rng = np.random.default_rng(5)
    n = 200
    path = tmp_path / "points3D.bin"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            xyz = rng.normal(size=3)
            rgb = rng.integers(0, 256, 3)
            tl = int(rng.integers(0, 6))
            f.write(struct.pack("<Q3d3Bd", i, *xyz, *rgb, rng.random()))
            f.write(struct.pack("<Q", tl))
            f.write(b"\x00" * (8 * tl))
    data = open(path, "rb").read()

    xyz_n, rgb_n, err_n = colmap.read_points3D_binary(str(path))
    assert xyz_n.shape == (n, 3) and rgb_n.shape == (n, 3)

    if get_lib() is not None:  # native available: cross-check vs python loop
        native = points3d_parse_native(data)
        assert native is not None
        # force the python path by truncating... instead re-parse manually
        import io
        f = io.BytesIO(data)
        num = colmap._read_next_bytes(f, 8, "Q")[0]
        xyz_p = np.empty((num, 3))
        rgb_p = np.empty((num, 3), np.uint8)
        err_p = np.empty((num, 1))
        for i in range(num):
            vals = colmap._read_next_bytes(f, 43, "QdddBBBd")
            xyz_p[i] = vals[1:4]
            rgb_p[i] = vals[4:7]
            err_p[i] = vals[7]
            tl = colmap._read_next_bytes(f, 8, "Q")[0]
            f.read(8 * tl)
        assert np.array_equal(native[0], xyz_p)
        assert np.array_equal(native[1], rgb_p)
        assert np.array_equal(native[2], err_p)
        # malformed buffer → clean None (no crash/overread)
        assert points3d_parse_native(data[:-5]) is None


def test_native_parser_rejects_overflowing_lengths():
    """A corrupt/hostile u64 track_len (or npts) must be rejected before it
    overflows the offset arithmetic into a negative value that passes the
    bounds check and triggers an out-of-bounds read (round-1 advisor
    finding)."""
    import struct

    from instascene_tpu.data.native import (get_lib, points3d_parse_native)
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")

    buf = struct.pack("<Q", 2)
    buf += struct.pack("<Q3d3Bd", 1, 0.0, 0.0, 0.0, 0, 0, 0, 0.1)
    buf += struct.pack("<Q", 0xFFFFFFFFFFFFFFF0)   # hostile track_len
    buf += b"\x00" * 64
    assert points3d_parse_native(buf) is None


@pytest.mark.parametrize("model", ["SIMPLE_PINHOLE", "PINHOLE",
                                   "SIMPLE_RADIAL", "OPENCV"])
def test_camera_models_through_reader(tmp_path, model):
    """All four COLMAP camera models of reference dataset_readers.py:87-97
    flow through the binary parser, FOV derivation and load_camera's
    resolution rules (-1 auto-cap no-op below 1600, -r 2 halving)."""
    from instascene_tpu.cameras import focal2fov, fov2focal, load_camera
    from instascene_tpu.data.synthetic import make_synthetic_scene

    W, H = 64, 48
    src = str(tmp_path / model.lower())
    make_synthetic_scene(src, n_points=50, n_cams=2, width=W, height=H,
                         camera_model=model)
    info = read_colmap_scene(src, "images", False)
    assert len(info.train_cameras) == 2
    ci = info.train_cameras[0]
    focal = fov2focal(0.9, W)
    assert np.isclose(ci.FovX, 0.9)
    assert np.isclose(ci.FovY, focal2fov(focal, H))

    args = ModelParams(source_path=src)  # resolution -1: W < 1600, no-op
    cam = load_camera(args, 0, ci)
    assert (cam.width, cam.height) == (W, H)
    assert cam.image.shape == (H, W, 3)
    args2 = ModelParams(source_path=src, resolution=2)
    cam2 = load_camera(args2, 0, ci)
    assert (cam2.width, cam2.height) == (W // 2, H // 2)
    assert cam2.image.shape == (H // 2, W // 2, 3)


def test_camera_model_with_priors_and_segmap(tmp_path):
    """SIMPLE_RADIAL scene with a normal prior + segmap: load_camera resizes
    the label map NEAREST (ids preserved, no interpolation) and rotates the
    normal prior into world frame as unit-ish vectors."""
    from PIL import Image

    from instascene_tpu.cameras import load_camera
    from instascene_tpu.data.synthetic import make_synthetic_scene

    W, H = 64, 48
    src = str(tmp_path / "scene")
    make_synthetic_scene(src, n_points=50, n_cams=2, width=W, height=H,
                         camera_model="SIMPLE_RADIAL")
    os.makedirs(os.path.join(src, "sam/mask"))
    os.makedirs(os.path.join(src, "normals"))
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 7, (H, W)).astype(np.uint8)
    for name in ("img_000.png", "img_001.png"):
        Image.fromarray(labels).save(os.path.join(src, "sam/mask", name))
        npix = rng.random((H, W, 3)).astype(np.float32)
        npix /= np.linalg.norm(npix, axis=-1, keepdims=True)
        Image.fromarray((255 * (npix * 0.5 + 0.5)).astype(np.uint8)).save(
            os.path.join(src, "normals", name))

    info = read_colmap_scene(src, "images", False)
    args = ModelParams(source_path=src, resolution=2,
                       w_normal_prior="normals", use_seg_feature=True)
    cam = load_camera(args, 0, info.train_cameras[0])
    assert cam.segmap is not None and cam.segmap.shape == (H // 2, W // 2)
    # NEAREST: every resized label exists in the source label set
    assert set(np.unique(cam.segmap)) <= set(np.unique(labels).tolist())
    assert cam.normal is not None and cam.normal.shape == (H // 2, W // 2, 3)
    norms = np.linalg.norm(cam.normal, axis=-1)
    assert norms.max() < 1.2 and norms.min() > 0.3  # unit-ish after 8-bit png


def test_sh_rotation_equivariance(rng):
    """utils/sh_rotation.py: the numerically-derived real-SH rotation blocks
    must be exactly equivariant under the framework's own basis —
    eval_sh(rotate(c), R·d) == eval_sh(c, d) — and quaternion composition
    must satisfy rotmat(q_R ⊗ q) == R @ rotmat(q)."""
    from instascene_tpu.ops.sh import eval_sh_np
    from instascene_tpu.utils.general import build_rotation_np
    from instascene_tpu.utils.sh_rotation import (compose_quaternion,
                                                  euler_deg_to_rotmat,
                                                  rotate_sh_rest,
                                                  rotmat_to_quat)
    R = euler_deg_to_rotmat([33.0, -71.0, 12.0])
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    N = 50
    sh = rng.standard_normal((N, 16, 3))
    sh_rot = sh.copy()
    sh_rot[:, 1:] = rotate_sh_rest(sh[:, 1:], R)
    d = rng.standard_normal((N, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a = eval_sh_np(3, sh, d)                 # original radiance at d
    b = eval_sh_np(3, sh_rot, d @ R.T)       # rotated radiance at R·d
    assert np.abs(a - b).max() < 1e-10

    q = rng.standard_normal((N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q2 = compose_quaternion(rotmat_to_quat(R), q)
    err = np.abs(build_rotation_np(q2)
                 - np.einsum("ij,njk->nik", R, build_rotation_np(q))).max()
    assert err < 1e-12


def test_align_coords_render_invariance(tmp_path, rng):
    """scripts/align_coords.py end to end: rotating the whole scene (gaussian
    xyz + quaternions + SH via the PLY path, COLMAP poses + points via the
    sparse path) and rotating the camera with it must reproduce the original
    render pixel-for-pixel (up to f32), and the aligned COLMAP model must
    satisfy c2w' = R4 @ c2w with points x' = R x."""
    import sys

    import jax.numpy as jnp
    from scene_builder import make_blob_gaussians

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.align_coords import rotate_colmap, rotate_gaussians

    from instascene_tpu.data.colmap import (qvec2rotmat, read_images_binary,
                                            read_points3D_binary)
    from instascene_tpu.models.gaussians import load_ply, save_ply
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    from instascene_tpu.utils.sh_rotation import euler_deg_to_rotmat
    from instascene_tpu.viewer.gui import OrbitCamera

    params, _ = make_blob_gaussians()
    # give the blobs non-trivial view-dependent color so SH rotation matters
    fr = rng.normal(size=params.features_rest.shape).astype(np.float32) * 0.3
    params = params.replace(features_rest=jnp.asarray(fr),
                            active_sh_degree=3)
    ply = str(tmp_path / "model.ply")
    save_ply(params, ply)

    R = euler_deg_to_rotmat([25.0, -40.0, 65.0])
    out_ply = rotate_gaussians(ply, R, seg_feat_dim=16)
    p2 = load_ply(out_ply, seg_feat_dim=16, load_seg_feat=True)
    p2 = p2.replace(active_sh_degree=3)

    W, H = 64, 48
    cam = OrbitCamera(W, H, r=4.0).minicam()
    w2v = np.asarray(cam.w2v, np.float64)
    R4 = np.eye(4)
    R4[:3, :3] = R
    cfg = RasterizeConfig(width=W, height=H, impl="xla", pair_cap=65536)
    # column convention throughout (cameras.py:8-13): p_view = w2v @ p_world,
    # full_proj = proj @ w2v, camera_center = inv(w2v)[:3, 3]
    proj = np.asarray(cam.full_proj, np.float64) @ np.linalg.inv(w2v)

    def render(p, w2v_np):
        w2v_j = jnp.asarray(w2v_np.astype(np.float32))
        full = jnp.asarray((proj @ w2v_np).astype(np.float32))
        campos = jnp.asarray(np.linalg.inv(w2v_np)[:3, 3].astype(np.float32))
        out = rasterize(p.xyz, p.scaling_activated(),
                        p.rotation_normalized(),
                        p.opacity_activated()[:, 0],
                        CameraMats(w2v_j, full, campos), jnp.zeros(3), cfg,
                        shs=p.features(), sh_degree=3, alive=p.alive)
        return np.asarray(out.blend.color)

    img_a = render(params, w2v)
    # rotating the world by R4 (x' = R4 x) keeps the view fixed iff the new
    # view matrix satisfies w2v' x' = w2v x, i.e. w2v' = w2v @ R4⁻¹ = w2v @ R4ᵀ
    w2v2 = w2v @ R4.T
    img_b = render(p2, w2v2)
    assert np.abs(img_a - img_b).max() < 5e-3, np.abs(img_a - img_b).max()

    # COLMAP path on a synthetic sparse model
    from scene_builder import build_e2e_scene
    scene = str(tmp_path / "parent" / "scene")
    build_e2e_scene(scene, width=32, height=24, n_cams=3)
    ims0 = read_images_binary(os.path.join(scene, "sparse/0/images.bin"))
    xyz0, _, _ = read_points3D_binary(
        os.path.join(scene, "sparse/0/points3D.bin"))
    out_dir = rotate_colmap(scene, R4)
    ims1 = read_images_binary(os.path.join(out_dir, "images.bin"))
    xyz1, _, _ = read_points3D_binary(os.path.join(out_dir, "points3D.bin"))
    assert np.abs(xyz1 - xyz0 @ R4[:3, :3].T).max() < 1e-6
    for k in ims0:
        w2c0 = np.eye(4)
        w2c0[:3, :3] = qvec2rotmat(ims0[k].qvec)
        w2c0[:3, 3] = ims0[k].tvec
        w2c1 = np.eye(4)
        w2c1[:3, :3] = qvec2rotmat(ims1[k].qvec)
        w2c1[:3, 3] = ims1[k].tvec
        c2w0, c2w1 = np.linalg.inv(w2c0), np.linalg.inv(w2c1)
        assert np.abs(c2w1 - R4 @ c2w0).max() < 1e-8
