"""Video recording for eval rollouts.

Equivalent of the reference's VideoRecorder/TrainVideoRecorder
(url_benchmark/video.py:14-112), which render via MuJoCo EGL. Here frames
are drawn from the physics vector with a small pure-numpy rasterizer per
domain (gridworld cells, point-mass maze walls+mass, locomotion skeletons
from forward kinematics), so recording works anywhere — including headless
TPU hosts — without a GL stack. Output is mp4/gif via imageio.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import numpy as np


def _blank(h: int = 256, w: int = 256) -> np.ndarray:
    return np.full((h, w, 3), 245, np.uint8)


def _draw_disk(img: np.ndarray, cy: float, cx: float, r: float,
               color: tp.Tuple[int, int, int]) -> None:
    h, w, _ = img.shape
    ylo, yhi = max(0, int(cy - r) - 1), min(h, int(cy + r) + 2)
    xlo, xhi = max(0, int(cx - r) - 1), min(w, int(cx + r) + 2)
    if ylo >= yhi or xlo >= xhi:
        return
    y, x = np.ogrid[ylo:yhi, xlo:xhi]
    mask = (y - cy) ** 2 + (x - cx) ** 2 <= r ** 2
    img[ylo:yhi, xlo:xhi][mask] = color


def _draw_line(img: np.ndarray, y0: float, x0: float, y1: float, x1: float,
               color: tp.Tuple[int, int, int], width: int = 3) -> None:
    """Capsule (thick segment) via one vectorized point-to-segment
    distance over the segment's bounding box."""
    h, w, _ = img.shape
    ylo = max(0, int(min(y0, y1) - width) - 1)
    yhi = min(h, int(max(y0, y1) + width) + 2)
    xlo = max(0, int(min(x0, x1) - width) - 1)
    xhi = min(w, int(max(x0, x1) + width) + 2)
    if ylo >= yhi or xlo >= xhi:
        return
    y, x = np.ogrid[ylo:yhi, xlo:xhi]
    dy, dx = y1 - y0, x1 - x0
    denom = dy * dy + dx * dx
    t = 0.0 if denom == 0 else np.clip(
        ((y - y0) * dy + (x - x0) * dx) / denom, 0.0, 1.0)
    dist2 = (y - (y0 + t * dy)) ** 2 + (x - (x0 + t * dx)) ** 2
    img[ylo:yhi, xlo:xhi][dist2 <= width ** 2] = color


def _np_fk2d(model: tp.Any, q: np.ndarray
             ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Planar fk in numpy — the render path must never dispatch device ops
    (each eager jax call goes through the TPU relay on a tunneled chip)."""
    q = np.asarray(q, np.float64)
    anchor = model.anchor
    nb = len(model.parent)
    origins = np.zeros((nb, 2))
    angles = np.zeros(nb)
    origins[0] = q[0:2]
    angles[0] = q[2]
    for b in range(1, nb):
        p = model.parent[b]
        c, s = np.cos(angles[p]), np.sin(angles[p])
        ax, az = anchor[b]
        origins[b] = origins[p] + (c * ax - s * az, s * ax + c * az)
        angles[b] = angles[p] + q[3 + b - 1]
    return origins, angles


def _np_fk3d(model: tp.Any, q: np.ndarray) -> np.ndarray:
    """3-D fk origins in numpy (see _np_fk2d for why not jax)."""
    q = np.asarray(q, np.float64)
    anchor = model.anchor
    axis = model.axis
    nb = len(model.parent)

    def euler_rot(e: np.ndarray) -> np.ndarray:
        cx, sx = np.cos(e[0]), np.sin(e[0])
        cy, sy = np.cos(e[1]), np.sin(e[1])
        cz, sz = np.cos(e[2]), np.sin(e[2])
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return rz @ ry @ rx

    def axis_rot(k: np.ndarray, a: float) -> np.ndarray:
        c, s = np.cos(a), np.sin(a)
        kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) * c + s * kx + (1 - c) * np.outer(k, k)

    origins = np.zeros((nb, 3))
    rots = np.zeros((nb, 3, 3))
    origins[0] = q[0:3]
    rots[0] = euler_rot(q[3:6])
    for b in range(1, nb):
        p = model.parent[b]
        origins[b] = origins[p] + rots[p] @ anchor[b]
        rots[b] = rots[p] @ axis_rot(axis[b], q[6 + b - 1])
    return origins


class _NpModel:
    """Host-side copy of an env model's kinematic constants. Built once —
    the fk helpers run per FRAME, and reading device arrays there would
    pay a device-to-host transfer (through the TPU relay) per frame."""

    def __init__(self, model: tp.Any) -> None:
        self.parent = tuple(model.parent)
        self.ndof = model.ndof
        self.anchor = np.asarray(model.anchor)
        self.com = np.asarray(model.com) if hasattr(model, "com") else None
        self.axis = np.asarray(model.axis) if hasattr(model, "axis") else None


class Renderer:
    """physics vector -> RGB frame, per domain."""

    def __init__(self, domain: str, env: tp.Any = None) -> None:
        self.domain = domain
        self.env = env
        self.model: tp.Optional[_NpModel] = None
        if env is not None and hasattr(env, "model"):
            self.model = _NpModel(env.model)

    def __call__(self, physics: np.ndarray) -> np.ndarray:
        physics = np.asarray(physics)
        if self.domain == "grid":
            return self._grid(physics)
        if self.domain == "point_mass_maze":
            return self._maze(physics)
        if self.domain in ("quadruped", "jaco"):
            return self._body3d(physics)
        if self.model is None:  # no kinematic model (e.g. d4rl replay)
            return _blank()
        return self._locomotion(physics)

    def _grid(self, physics: np.ndarray) -> np.ndarray:
        img = _blank()
        cell = 256 // 10
        layout = (np.asarray(self.env.layout) if self.env is not None
                  else None)
        if layout is not None:
            for (y, x) in np.argwhere(layout == -1):
                img[y * cell:(y + 1) * cell, x * cell:(x + 1) * cell] = (120, 125, 130)
        ay, ax, gy, gx = physics[:4]
        img[int(gy) * cell:int(gy + 1) * cell,
            int(gx) * cell:int(gx + 1) * cell] = (90, 180, 90)
        _draw_disk(img, (ay + 0.5) * cell, (ax + 0.5) * cell, cell // 3,
                   (230, 120, 40))
        return img

    def _maze(self, physics: np.ndarray) -> np.ndarray:
        img = _blank()
        scale = 256 / 0.6  # arena is ±0.3

        def to_px(x: float, y: float) -> tp.Tuple[float, float]:
            return (128 - y * scale, 128 + x * scale)

        # cross walls (half-length 0.18)
        for (x0, y0, x1, y1) in [(-0.18, 0, 0.18, 0), (0, -0.18, 0, 0.18)]:
            py0, px0 = to_px(x0, y0)
            py1, px1 = to_px(x1, y1)
            _draw_line(img, py0, px0, py1, px1, (120, 125, 130), 4)
        py, px = to_px(physics[0], physics[1])
        _draw_disk(img, py, px, 6, (230, 120, 40))
        return img

    def _locomotion(self, physics: np.ndarray) -> np.ndarray:
        img = _blank()
        model = self.model
        assert model is not None
        ndof = model.ndof
        q = physics[:ndof]
        origins, angles = _np_fk2d(model, q)
        scale = 80.0
        cx = 128 - origins[0, 0] * scale  # camera follows the root
        ground_y = 220.0

        def to_px(x: float, z: float) -> tp.Tuple[float, float]:
            return (ground_y - z * scale, cx + x * scale)

        img[int(ground_y):, :] = (210, 205, 195)
        # draw each body as a segment from its origin toward its child or
        # along its own capsule direction (COM doubled)
        coms = np.asarray(origins) + np.stack(
            [np.cos(angles) * model.com[:, 0]
             - np.sin(angles) * model.com[:, 1],
             np.sin(angles) * model.com[:, 0]
             + np.cos(angles) * model.com[:, 1]], axis=1)
        for b in range(len(origins)):
            end = origins[b] + 2 * (coms[b] - origins[b])
            y0, x0 = to_px(*origins[b])
            y1, x1 = to_px(*end)
            _draw_line(img, y0, x0, y1, x1, (60, 90, 160), 4)
        return img


    def _body3d(self, physics: np.ndarray) -> np.ndarray:
        """Quadruped / jaco: oblique projection of the 3-D kinematic tree
        (x right, y into the screen with a 0.4 shear, z up)."""
        img = _blank()
        model = self.model
        assert model is not None
        q = physics[: model.ndof]
        origins = _np_fk3d(model, q)
        scale = 120.0 if self.domain == "quadruped" else 220.0
        shear = 0.4
        root = origins[0]
        ground_y = 220.0

        def to_px(p: np.ndarray) -> tp.Tuple[float, float]:
            sx = (p[0] - root[0]) + shear * (p[1] - root[1])
            sz = p[2] + shear * 0.5 * (p[1] - root[1])
            return (ground_y - sz * scale, 128 + sx * scale)

        img[int(ground_y):, :] = (210, 205, 195)
        for b in range(1, len(origins)):
            y0, x0 = to_px(origins[model.parent[b]])
            y1, x1 = to_px(origins[b])
            _draw_line(img, y0, x0, y1, x1, (60, 90, 160), 4)
        _draw_disk(img, *to_px(origins[0]), 7, (40, 60, 120))
        if self.domain == "jaco":
            # target site from the physics tail (envs/jaco.py layout)
            target = physics[2 * model.ndof:2 * model.ndof + 3]
            if target.size == 3:
                _draw_disk(img, *to_px(target), 5, (200, 60, 60))
        return img


class VideoRecorder:
    """Frame accumulator + save (reference video.py:14-64)."""

    def __init__(self, root_dir: tp.Optional[tp.Union[str, Path]],
                 renderer: Renderer, enabled: bool = True,
                 fps: int = 20) -> None:
        self.save_dir: tp.Optional[Path] = None
        if root_dir is not None:
            self.save_dir = Path(root_dir) / "eval_video"
            self.save_dir.mkdir(exist_ok=True, parents=True)
        self.renderer = renderer
        self.enabled = enabled and self.save_dir is not None
        self.fps = fps
        self.frames: tp.List[np.ndarray] = []

    def init(self, physics: np.ndarray, enabled: bool = True) -> None:
        self.frames = []
        self.enabled = enabled and self.save_dir is not None
        self.record(physics)

    def record(self, physics: np.ndarray) -> None:
        if self.enabled:
            self.frames.append(self.renderer(physics))

    def record_trajectory(self, physics_traj: np.ndarray) -> None:
        """Record a whole [T, physics_dim] trajectory (the collector
        returns full trajectories; no per-step host hook needed)."""
        if self.enabled:
            for row in np.asarray(physics_traj):
                self.frames.append(self.renderer(row))

    def save(self, file_name: str) -> tp.Optional[Path]:
        if not (self.enabled and self.frames):
            return None
        import imageio
        assert self.save_dir is not None
        path = self.save_dir / file_name
        try:
            imageio.mimsave(str(path), self.frames, fps=self.fps)
        except (ValueError, ImportError):
            # no mp4/ffmpeg backend in this environment -> gif fallback
            path = path.with_suffix(".gif")
            imageio.mimsave(str(path), self.frames,
                            duration=1000.0 / self.fps)
        return path
