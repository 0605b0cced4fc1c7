"""Pixel observations as a pure-JAX render of the physics state.

The reference's ``obs_type="pixels"`` path gets 84x84 RGB frames from
MuJoCo's EGL renderer and stacks 3 of them channel-wise
(url_benchmark/dmc.py:188-233 FrameStackWrapper; pretrain configs
``obs_type: pixels``). A host renderer would break the vectorized
TPU collection loop, so here frames are rasterized *on device* as a pure
function of the physics vector — point-mass maze as disk+walls+target,
planar locomotion as a capsule stick figure from forward kinematics —
making pixel envs exactly as jit/vmap-able as state envs.

Observations stay FLAT (H*W*C vector) through the wrapper API so replay
buffers and collectors are layout-agnostic; ``spec.obs_shape`` records
(H, W, C) and encoder agents reshape at their input boundary. Values are
uint8 in [0, 255] like the reference's frames — the replay buffer stores
per-name dtypes, so pixel replay is 4x smaller than float storage; the
encoder casts and normalizes by /255 on device.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

from .base import Environment, TimeStep

Array = jnp.ndarray


def _pixel_grid(size: int, half_extent: float, center: Array
                ) -> tp.Tuple[Array, Array]:
    """World (x, y) coordinates of each pixel; row 0 = top (+y)."""
    lin = jnp.linspace(-half_extent, half_extent, size)
    xs = center[0] + lin[None, :]
    ys = center[1] - lin[:, None]
    return (jnp.broadcast_to(xs, (size, size)),
            jnp.broadcast_to(ys, (size, size)))


def _splat_disks(px: Array, py: Array, centers: Array, radii: Array
                 ) -> Array:
    """Soft coverage in [0,1] of a set of disks. centers [K,2], radii [K]."""
    d = jnp.sqrt((px[..., None] - centers[:, 0]) ** 2
                 + (py[..., None] - centers[:, 1]) ** 2)
    # ~2px-wide soft edge, scaled to the radius
    cov = jax.nn.sigmoid((radii - d) / (0.15 * radii + 1e-8))
    return jnp.max(cov, axis=-1)


def _splat_segments(px: Array, py: Array, a: Array, b: Array, radius: float
                    ) -> Array:
    """Soft coverage of capsule segments a->b ([S,2] each)."""
    ab = b - a  # [S,2]
    ap_x = px[..., None] - a[:, 0]
    ap_y = py[..., None] - a[:, 1]
    denom = jnp.sum(ab * ab, axis=-1) + 1e-8
    t = jnp.clip((ap_x * ab[:, 0] + ap_y * ab[:, 1]) / denom, 0.0, 1.0)
    dx = ap_x - t * ab[:, 0]
    dy = ap_y - t * ab[:, 1]
    d = jnp.sqrt(dx * dx + dy * dy)
    cov = jax.nn.sigmoid((radius - d) / (0.15 * radius))
    return jnp.max(cov, axis=-1)


def pointmass_frame(physics: Array, size: int = 84) -> Array:
    """[size, size, 3] float frame in [0,255] for the point-mass maze.

    Draws the four-room walls (envs/pointmass.py layout: outer border +
    cross walls with door gaps), the mass (white disk) — target comes from
    the task, not the physics vector, so frames stay task-agnostic like
    the reference's camera images of the physical scene.
    """
    px, py = _pixel_grid(size, 0.32, jnp.zeros(2))
    # walls: +-0.3 border + plus-shaped cross of half-length 0.18,
    # half-thickness 0.02 (envs/pointmass.py arena)
    border = ((jnp.abs(px) > 0.3) | (jnp.abs(py) > 0.3)).astype(jnp.float32)
    cross_x = (jnp.abs(px) < 0.02) & (jnp.abs(py) < 0.18)
    cross_y = (jnp.abs(py) < 0.02) & (jnp.abs(px) < 0.18)
    walls = jnp.maximum(border, (cross_x | cross_y).astype(jnp.float32))
    mass = _splat_disks(px, py, physics[None, 0:2], jnp.asarray([0.02]))
    r = jnp.clip(0.25 * walls + mass, 0.0, 1.0)
    g = jnp.clip(0.25 * walls + 0.3 * mass, 0.0, 1.0)
    bkg = jnp.full_like(r, 0.08)
    frame = jnp.stack([jnp.maximum(r, bkg), jnp.maximum(g, bkg),
                       jnp.maximum(0.25 * walls, bkg)], axis=-1)
    return frame * 255.0


def make_locomotion_frame_fn(model: tp.Any, size: int = 84
                             ) -> tp.Callable[[Array], Array]:
    """Stick-figure renderer for a planar PlanarModel (walker/cheetah/
    hopper): capsule segments parent-origin -> body-origin from fk, camera
    tracking the torso x. Returns a jittable physics -> [size,size,3] fn."""
    from . import physics2d as p2d

    child_pairs = [(model.parent[b], b) for b in range(1, model.nb)]

    def frame_fn(physics: Array) -> Array:
        q = physics[:model.ndof]
        origins, _ = p2d.fk(model, q)
        center = jnp.stack([q[0], jnp.asarray(0.65)])
        px, pz = _pixel_grid(size, 1.0, center)
        a = origins[jnp.asarray([p for p, _ in child_pairs])]
        b = origins[jnp.asarray([c for _, c in child_pairs])]
        body = _splat_segments(px, pz, a, b, 0.06)
        torso = _splat_disks(px, pz, origins[None, 0], jnp.asarray([0.09]))
        fig = jnp.clip(body + torso, 0.0, 1.0)
        ground = (pz < 0.0).astype(jnp.float32) * 0.35
        bkg = jnp.full_like(fig, 0.08)
        r = jnp.maximum(jnp.maximum(fig, ground * 0.8), bkg)
        g = jnp.maximum(jnp.maximum(0.8 * fig, ground), bkg)
        bl = jnp.maximum(jnp.maximum(0.6 * fig, ground * 0.5), bkg)
        return jnp.stack([r, g, bl], axis=-1) * 255.0

    return frame_fn


class PixelState(struct.PyTreeNode):
    inner: tp.Any
    frames: Array  # [stack, H, W, C]


class PixelWrapper(Environment):
    """Wrap a state env with rendered pixel observations + frame stacking.

    frame_fn: physics -> [H, W, C] float frame in [0, 255]. The stacked
    frames are flattened channel-last: obs = [H, W, stack*C] -> flat.
    """

    def __init__(self, env: Environment, frame_fn: tp.Callable[[Array], Array],
                 size: int = 84, frame_stack: int = 3) -> None:
        self.env = env
        self.frame_fn = frame_fn
        self.size = size
        self.frame_stack = frame_stack
        shape = (size, size, 3 * frame_stack)
        self.spec = env.spec.replace(
            obs_dim=int(shape[0] * shape[1] * shape[2]), obs_shape=shape)

    # state rewards still relabel from physics (pointmass also takes the
    # action, hence *args)
    def reward_from_physics(self, physics: Array, *args: Array) -> Array:
        return self.env.reward_from_physics(physics, *args)  # type: ignore[attr-defined]

    def goal_features(self, physics: Array) -> Array:
        return self.env.goal_features(physics)  # type: ignore[attr-defined]

    def _obs(self, frames: Array) -> Array:
        # [stack,H,W,C] -> [H,W,stack*C] -> flat uint8
        stacked = jnp.concatenate(list(frames), axis=-1)
        return stacked.reshape(-1).astype(jnp.uint8)

    def reset(self, key: jax.Array) -> tp.Tuple[PixelState, TimeStep]:
        inner, ts = self.env.reset(key)
        frame = self.frame_fn(ts.physics)
        frames = jnp.tile(frame[None], (self.frame_stack, 1, 1, 1))
        state = PixelState(inner=inner, frames=frames)
        return state, ts.replace(observation=self._obs(frames))

    def step(self, state: PixelState, action: Array
             ) -> tp.Tuple[PixelState, TimeStep]:
        inner, ts = self.env.step(state.inner, action)
        frame = self.frame_fn(ts.physics)
        frames = jnp.concatenate([state.frames[1:], frame[None]], axis=0)
        new_state = PixelState(inner=inner, frames=frames)
        return new_state, ts.replace(observation=self._obs(frames))


def make_pixel_env(task: str, size: int = 84, frame_stack: int = 3,
                   episode_length: tp.Optional[int] = None) -> PixelWrapper:
    """Pixel variant of a state env by task name (pointmass + planar
    locomotion domains)."""
    from ..train.workspace import make_env
    env = make_env(task, episode_length)
    domain = task.split("_", 1)[0]
    if task.startswith("point_mass_maze_"):
        frame_fn: tp.Callable[[Array], Array] = (
            lambda p: pointmass_frame(p, size))
    elif domain in ("walker", "cheetah", "hopper"):
        frame_fn = make_locomotion_frame_fn(env.model, size)
    else:
        raise ValueError(f"No pixel renderer for task {task!r}")
    return PixelWrapper(env, frame_fn, size=size, frame_stack=frame_stack)
