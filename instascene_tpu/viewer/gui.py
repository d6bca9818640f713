"""Interactive instance segmentation: headless engine + optional dearpygui app.

Parity: reference semantic_gui.py:65-627 (OrbitCamera, GaussianSplattingGUI).
The click-segmentation logic lives in a headless SegmentationEngine so it is
testable and scriptable without a display; the dearpygui shell (gated import)
wires the same engine to widgets."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..cameras import MiniCam, get_projection_matrix
from ..models import gaussians as gmod
from ..semantic.export import pca_proj_matrix


class OrbitCamera:
    """Orbit camera (semantic_gui.py:65-160 parity)."""

    def __init__(self, width, height, r=2.0, fovy=60.0):
        self.W = width
        self.H = height
        self.radius = r
        self.fovy = np.deg2rad(fovy)
        self.center = np.zeros(3, dtype=np.float32)
        from scipy.spatial.transform import Rotation
        self.rot = Rotation.from_matrix(np.eye(3))
        self.up = np.array([0, 1, 0], dtype=np.float32)

    @property
    def fovx(self):
        return 2 * np.arctan(np.tan(self.fovy / 2) * self.W / self.H)

    @property
    def pose(self):
        """c2w, COLMAP convention (z forward): camera at center − R·(0,0,r),
        looking at the orbit center."""
        res = np.eye(4, dtype=np.float32)
        res[:3, :3] = self.rot.as_matrix()
        res[:3, 3] = self.center - res[:3, :3] @ np.array(
            [0, 0, self.radius], dtype=np.float32)
        return res

    def orbit(self, dx, dy):
        from scipy.spatial.transform import Rotation
        side = self.rot.as_matrix()[:3, 0]
        up = self.rot.as_matrix()[:3, 1]
        rotvec_x = up * np.radians(-0.05 * dx)
        rotvec_y = side * np.radians(-0.05 * dy)
        self.rot = (Rotation.from_rotvec(rotvec_x)
                    * Rotation.from_rotvec(rotvec_y) * self.rot)

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0):
        self.center += 2e-4 * self.rot.as_matrix()[:3, :3] @ np.array(
            [dx, dy, dz], dtype=np.float32)

    def minicam(self, znear=0.01, zfar=100.0) -> MiniCam:
        c2w = self.pose
        w2v = np.linalg.inv(c2w).astype(np.float32)
        proj = get_projection_matrix(znear, zfar, self.fovx, self.fovy)
        return MiniCam(self.W, self.H, self.fovy, self.fovx, znear, zfar,
                       w2v=w2v, full_proj=(proj @ w2v).astype(np.float32))


@dataclass
class SegmentationEngine:
    """Headless click-to-segment engine (fetch_data parity,
    semantic_gui.py:503-589)."""
    params: gmod.GaussianParams
    pipe: object
    bg_color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    score_threshold: float = 0.7
    dbscan_eps: float = 0.15
    dbscan_min_points: int = 10
    def __post_init__(self):
        self.proj_mat = pca_proj_matrix(np.asarray(self.params.seg_feature))
        self.chosen_features: List[np.ndarray] = []
        self.prompt_colors: List[np.ndarray] = []   # per-click overlay colors
        self._frame_key = None   # (pose bytes, params version, aux) of _frame
        self._frame = None
        self._params_version = 0
        self._initial_params = self.params   # for reload_data
        self._color_rng = np.random.default_rng(0)

    def reload(self) -> None:
        """Restore the model loaded at startup (reference reload_flag,
        semantic_gui.py:525-528)."""
        self.params = self._initial_params
        self._params_version += 1

    def load_ply(self, ply_path: str, seg_feat_dim: int = 16) -> None:
        """Swap in another PLY (reference file-dialog flow,
        semantic_gui.py:348-358): recompute the feature-PCA projection and
        reset prompts."""
        self.params = gmod.load_ply(ply_path, max_sh_degree=3,
                                    seg_feat_dim=seg_feat_dim,
                                    load_seg_feat=True)
        if self.params.seg_feature is None:
            raise ValueError(f"{ply_path} has no segfeat_* attributes")
        self._initial_params = self.params
        self.proj_mat = pca_proj_matrix(np.asarray(self.params.seg_feature))
        self.clear()
        self._params_version += 1

    def render_view(self, cam, need_aux: bool = False):
        """Render rgb + feature maps for `cam` — plus depth/normal/alpha maps
        when `need_aux` (full kernel instead of the viewer fast path; the
        reference GUI's render-option modes read these,
        semantic_gui.py:253-257,282). Re-renders only when the pose, the
        gaussian set, or the aux requirement changed (click/score updates
        reuse the frame), and defers the binning-overflow host sync to the
        next frame (drop_check="async") so the interactive loop never
        stalls."""
        key = (np.asarray(cam.w2v, np.float32).tobytes(),
               self._params_version, bool(need_aux))
        if self._frame_key == key:
            return self._frame
        from ..render import render
        pkg = render(cam, self.params, self.pipe, self.bg_color,
                     drop_check="async", viewer=not need_aux)
        rgb = np.asarray(pkg["render"])
        feat = np.asarray(pkg["seg_feature"])
        feat = feat / (np.linalg.norm(feat, axis=-1, keepdims=True) + 1e-6)
        feat_rgb = np.clip(feat @ self.proj_mat * 0.5 + 0.5, 0, 1)
        frame = {"rgb": rgb, "feat": feat, "feat_rgb": feat_rgb}
        if need_aux:
            frame["depth"] = np.asarray(pkg["surf_depth"])[..., 0]
            frame["normal"] = np.asarray(pkg["rend_normal"])
            frame["alpha"] = np.asarray(pkg["rend_alpha"])[..., 0]
        self._frame_key, self._frame = key, frame
        return frame

    def click(self, cam, x: int, y: int, multi: bool = True) -> None:
        """Add a feature prompt at pixel (x, y). With multi=False (the
        reference's multi-clickmode checkbox OFF) the new prompt replaces the
        existing ones instead of extending them."""
        if not multi:
            self.clear()
        feat = self.render_view(cam)["feat"]
        h, w = feat.shape[:2]
        self.chosen_features.append(feat[int(y) % h, int(x) % w])
        # per-prompt overlay color (semantic_gui.py:452)
        self.prompt_colors.append(
            self._color_rng.random(3).astype(np.float32) * 0.7 + 0.3)

    def clear(self) -> None:
        self.chosen_features = []
        self.prompt_colors = []

    def score_map(self, feat: np.ndarray) -> np.ndarray:
        """[H,W,P] scores in [0,1] per prompt."""
        prompts = np.stack(self.chosen_features, axis=-1)
        return (feat @ prompts + 1.0) / 2.0

    def gaussian_mask(self) -> np.ndarray:
        """3D mask: gaussians whose feature matches any prompt, DBSCAN-filtered
        to the largest spatial cluster (semantic_gui.py:557-574)."""
        feats = np.asarray(self.params.seg_feature_normed())
        prompts = np.stack(self.chosen_features, axis=-1)
        score = (feats @ prompts + 1.0) / 2.0
        mask = (score > self.score_threshold).sum(axis=1) > 0
        mask = mask & np.asarray(self.params.alive)
        if mask.sum() == 0:
            return mask
        from sklearn.cluster import DBSCAN
        pts = np.asarray(self.params.xyz)[mask]
        labels = DBSCAN(eps=self.dbscan_eps,
                        min_samples=self.dbscan_min_points
                        ).fit(pts).labels_ + 1
        ids, cnts = np.unique(labels, return_counts=True)
        best = ids[np.argmax(cnts)]
        keep_idx = np.nonzero(mask)[0][labels == best]
        out = np.zeros_like(mask)
        out[keep_idx] = True
        return out

    def segment_3d(self, save_dir: str, seg_id: int = 0):
        """Crop to the selected instance and save its PLY + mask."""
        mask = self.gaussian_mask()
        os.makedirs(save_dir, exist_ok=True)
        gmod.save_ply(self.params, os.path.join(save_dir,
                                                f"segment_{seg_id}.ply"),
                      crop_mask=mask[np.asarray(self.params.alive)])
        np.save(os.path.join(save_dir, f"segment_{seg_id}_mask.npy"), mask)
        self.params = self.params.replace(
            alive=self.params.alive & np.asarray(mask))
        self._params_version += 1
        return mask

    def segment_3d_convexhull(self, save_dir: str, seg_id: int = 0,
                              mode: str = "save"):
        """Crop by the convex hull of the feature-selected gaussians
        (gaussian_model.py:643-658): captures interior gaussians the feature
        threshold missed. Saves the instance PLY + oriented bbox."""
        mask = self.gaussian_mask()
        pts = np.asarray(self.params.xyz)[mask]
        if len(pts) < 4:   # Delaunay needs a non-degenerate 3D set
            return self.segment_3d(save_dir, seg_id)
        cropped, bbox = gmod.crop_pts_with_convexhull(
            self.params, pts, mode="save", return_bbox=True)
        os.makedirs(save_dir, exist_ok=True)
        gmod.save_ply(cropped, os.path.join(save_dir,
                                            f"segment_{seg_id}.ply"),
                      crop_mask=np.asarray(cropped.alive))
        np.save(os.path.join(save_dir, f"segment_{seg_id}_bbox.npy"),
                np.concatenate([bbox[0], bbox[2]]) if bbox else np.zeros(6))
        if mode == "delete":
            self.params = gmod.crop_pts_with_convexhull(self.params, pts,
                                                        mode="delete")
        else:
            self.params = cropped
        self._params_version += 1
        return np.asarray(cropped.alive)

    def delete_3d(self, save_dir: str, seg_id: int = 0):
        mask = self.gaussian_mask()
        os.makedirs(save_dir, exist_ok=True)
        gmod.save_ply(self.params, os.path.join(save_dir,
                                                f"segment_{seg_id}.ply"),
                      crop_mask=mask[np.asarray(self.params.alive)])
        self.params = self.params.replace(
            alive=self.params.alive & ~np.asarray(mask))
        self._params_version += 1
        gmod.save_ply(self.params, os.path.join(save_dir,
                                                f"deleted_{seg_id}.ply"))
        return mask


def compose_frame(engine: SegmentationEngine, frame: dict, mode: str
                  ) -> np.ndarray:
    """Display buffer for one render-option mode, with the per-prompt score
    overlay applied in rgb mode (semantic_gui.py:544-556: each prompt's
    thresholded region is tinted with that prompt's color)."""
    if mode == "rgb":
        rgb = frame["rgb"]
        if engine.chosen_features:
            score = engine.score_map(frame["feat"])      # [H,W,P]
            binary = score > engine.score_threshold
            out = rgb.copy()
            for k, color in enumerate(engine.prompt_colors):
                m = binary[..., k]
                out[m] = rgb[m] * 0.3 + color * 0.7
            return np.clip(out, 0, 1)
        return np.clip(rgb, 0, 1)
    if mode == "feature":
        return np.clip(frame["feat_rgb"] * 0.7 + 0.3, 0, 1)
    if mode == "depth":
        d = frame["depth"]
        dmax = float(d.max())
        g = d / dmax if dmax > 0 else d
        return np.repeat(g[..., None], 3, axis=-1).astype(np.float32)
    if mode == "normal":
        return np.clip(frame["normal"] * 0.5 + 0.5, 0, 1)
    if mode == "alpha":
        return np.repeat(np.clip(frame["alpha"], 0, 1)[..., None], 3,
                         axis=-1).astype(np.float32)
    raise ValueError(mode)


RENDER_MODES = ("rgb", "feature", "depth", "normal", "alpha")


def run_gui(engine: SegmentationEngine, width=800, height=600,
            interactive_note: str = "default", train_cameras=None,
            ply_path: str = ""):
    """dearpygui shell — widget surface matching reference
    semantic_gui.py:300-360: render-option cycle (rgb/feature/depth/normal/
    alpha), click-mode + multi-clickmode checkboxes, clear/segment/delete/
    reload buttons, score-threshold slider, COLMAP-camera browsing (when
    `train_cameras` is given), PLY file dialog; left-drag orbits, middle-drag
    pans, wheel zooms, right-click prompts (in click mode)."""
    try:
        import dearpygui.dearpygui as dpg
    except ImportError as e:
        raise RuntimeError(
            "dearpygui is not installed; use SegmentationEngine headlessly "
            "(render_view/click/segment_3d) or install dearpygui") from e

    cam = OrbitCamera(width, height, r=2.0)
    state = {"mode": 0, "seg_id": 0, "clickmode": False, "multi": False,
             "use_colmap": False, "mouse": (0.0, 0.0)}

    dpg.create_context()
    with dpg.texture_registry(show=False):
        dpg.add_raw_texture(width, height,
                            np.zeros((height, width, 3), np.float32),
                            format=dpg.mvFormat_Float_rgb, tag="_texture")

    def current_cam():
        if state["use_colmap"] and train_cameras:
            idx = int(dpg.get_value("_colmap_idx")) % len(train_cameras)
            return train_cameras[idx]
        return cam.minicam()

    def refresh():
        mode = RENDER_MODES[state["mode"]]
        frame = engine.render_view(current_cam(),
                                   need_aux=mode in ("depth", "normal",
                                                     "alpha"))
        buf = compose_frame(engine, frame, mode)
        dpg.set_value("_texture", buf.astype(np.float32).reshape(-1))

    out_dir = f"interactive_segmentation/{interactive_note}"

    def do_segment():
        engine.segment_3d(out_dir, state["seg_id"])
        state["seg_id"] += 1
        refresh()

    def do_delete():
        engine.delete_3d(out_dir, state["seg_id"])
        state["seg_id"] += 1
        refresh()

    def do_reload():
        engine.reload()
        refresh()

    def file_callback(sender, app_data):
        files = list(app_data.get("selections", {}).values())
        if files:
            engine.load_ply(files[0])
            refresh()

    with dpg.window(tag="_primary", width=width, height=height):
        dpg.add_image("_texture")

    with dpg.window(label="Control", tag="_control", width=400, height=520,
                    pos=[width + 10, 0]):
        dpg.add_text("Mouse position: click anywhere to start.",
                     tag="_pos_item")
        dpg.add_button(label="Render Option", tag="_button_mode",
                       callback=lambda: (state.update(
                           mode=(state["mode"] + 1) % len(RENDER_MODES)),
                           dpg.set_value("_mode_label",
                                         RENDER_MODES[state["mode"]]),
                           refresh()))
        dpg.add_text("rgb", tag="_mode_label")
        dpg.add_slider_float(label="Score Threshold", default_value=
                             engine.score_threshold, min_value=0.0,
                             max_value=1.0, tag="_ScoreThres",
                             callback=lambda s, v: (setattr(
                                 engine, "score_threshold", v), refresh()))
        dpg.add_checkbox(label="Click Mode", callback=lambda s: state.update(
            clickmode=not state["clickmode"]))
        dpg.add_checkbox(label="multi-clickmode",
                         callback=lambda s: state.update(
                             multi=dpg.get_value(s)))
        dpg.add_separator()
        dpg.add_button(label="clear_edit",
                       callback=lambda: (engine.clear(), refresh()))
        dpg.add_button(label="segment_3d", callback=lambda: do_segment())
        dpg.add_button(label="delete_3d", callback=lambda: do_delete())
        dpg.add_button(label="reload_data", callback=lambda: do_reload())
        if train_cameras:
            dpg.add_separator()
            dpg.add_button(label="Use Colmap Camera",
                           callback=lambda: (state.update(
                               use_colmap=not state["use_colmap"]),
                               refresh()))
            dpg.add_slider_int(label="Colmap Camera Idx", default_value=0,
                               max_value=len(train_cameras) - 1,
                               tag="_colmap_idx",
                               callback=lambda s, v: refresh())
        with dpg.file_dialog(directory_selector=False, show=False,
                             callback=file_callback, tag="_file_dialog",
                             width=700, height=400):
            dpg.add_file_extension(".*")
            dpg.add_file_extension("Ply files (*.ply){.ply}",
                                   color=(0, 255, 255, 255))
        dpg.add_button(label="Load .ply File",
                       callback=lambda: dpg.show_item("_file_dialog"))

    def on_click(sender, app_data):
        xy = dpg.get_mouse_pos(local=False)
        dpg.set_value("_pos_item", f"Mouse position = ({xy[0]}, {xy[1]})")
        if state["clickmode"] and app_data == 1:     # right click prompts
            engine.click(current_cam(), int(xy[0]), int(xy[1]),
                         multi=state["multi"])
            refresh()

    def on_drag(sender, app_data):
        _, dx, dy = app_data
        cam.orbit(dx, dy)
        refresh()

    def on_pan(sender, app_data):
        _, dx, dy = app_data
        cam.pan(dx * 20, dy * 20)
        refresh()

    def on_wheel(sender, app_data):
        cam.scale(app_data)
        refresh()

    with dpg.handler_registry():
        dpg.add_mouse_click_handler(callback=on_click)
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                   callback=on_drag)
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Middle,
                                   callback=on_pan)
        dpg.add_mouse_wheel_handler(callback=on_wheel)

    dpg.create_viewport(title="instascene-tpu", width=width + 440,
                        height=height + 100)
    dpg.setup_dearpygui()
    refresh()
    dpg.show_viewport()
    dpg.set_primary_window("_primary", True)
    dpg.start_dearpygui()
    dpg.destroy_context()
