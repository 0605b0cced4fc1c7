"""Quadruped — 3-D locomotion on the pure-JAX physics3d engine.

Re-creates the reference's quadruped domain and custom task set
(url_benchmark/custom_dmc_tasks/quadruped.py: stand/walk/run [speeds
0.5/5], jump [height 1.0], roll/roll_fast [speed-norm rewards]; reward
shapes :352-536). The model is this framework's own design — a box torso
with four 2-joint legs (hip pitch + knee) — not the MuJoCo ant; task
semantics, reward shapes and goal spaces match the reference.

``escape`` runs on a per-episode generated heightfield (sinusoidal bowl
x random smooth bumps, reference quadruped.py:541-556) via the engine's
sloped-normal terrain contact; observation adds origin-in-torso-frame
and a 20-ray rangefinder fan (reference rf_* sites + Escape obs
:577-582). ``fetch`` adds a free ball (soft contacts against ground,
boundary walls and the robot's collision spheres; one-way coupling — the
~1 kg ball's reaction on the ~40 kg robot is neglected) with the
reference's reach*(0.5+0.5*fetch)*upright reward (:600-646).

Actions pass through a first-order filter (time constant 0.1 s) before
the position servos — the reference's MJCF actuators are filtered the
same way (quadruped.xml:57 ``dyntype="filter" dynprm=".1"``), which
smooths exploration noise into continuous servo targets; without it the
14-dof walker falls under jittery random targets and online exploration
stalls. The filter state is part of the observation, as the reference's
``egocentric_state`` includes ``data.act``.

Observation layout (stand/walk/run/jump/roll): [joint angles (8), joint
velocities (8), torso rotation rows x/z (6), torso height (1), torso
linear velocity (3), torso angular velocity (3), actuator filter state
(8)] -> 37. escape appends origin (3) + rangefinder (20) -> 60; fetch
appends ball_state (9) + target_position (3) -> 49.

Goal features (goals/spaces.py quadruped layout):
[up, 0, x, y, z, vx, vy, vz].
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.tolerance import tolerance
from . import physics3d as p3d
from .base import Environment, EnvSpec, StepType, TimeStep

Array = jnp.ndarray

_WALK_SPEED = 0.5
_RUN_SPEED = 5.0
_JUMP_HEIGHT = 1.0

# escape terrain (reference quadruped.xml:13 hfield size "30 30 5 .1")
_TERRAIN_HALF = 30.0
_TERRAIN_ZMAX = 5.0
_TERRAIN_RES = 101
_TERRAIN_SMOOTHNESS = 0.15
_TERRAIN_BUMP_SCALE = 2.0
_N_RANGEFINDERS = 20

# fetch arena (reference quadruped.xml:77-82,199-203)
_FLOOR_HALF = 15.0
_BALL_RADIUS = 0.15
_BALL_MASS = 1.0
_TARGET_RADIUS = 0.4
_WORKSPACE_OFFSET = (0.4, 0.0, -0.1)  # torso-frame (scaled to this model)
_WORKSPACE_RADIUS = 0.3

TASKS = ["stand", "walk", "run", "jump", "roll", "roll_fast",
         "escape", "fetch"]

# actuator first-order filter time constant (reference quadruped.xml:57)
_ACT_TAU = 0.1

# geometry
_TORSO_HALF = (0.23, 0.23, 0.07)
_UPPER_LEN = 0.20
_LOWER_LEN = 0.25
_LEG_R = 0.04
_INIT_Z = 0.55


def quadruped_model() -> p3d.Model3D:
    """9 bodies: torso + 4x(upper, lower) legs. 14 dof (6 root + 8 hinges)."""
    tm = 1000.0 * (2 * _TORSO_HALF[0]) * (2 * _TORSO_HALF[1]) * (2 * _TORSO_HALF[2])
    um = p3d.rod_inertia3  # alias for brevity below
    upper_mass = 1000.0 * np.pi * _LEG_R ** 2 * _UPPER_LEN
    lower_mass = 1000.0 * np.pi * _LEG_R ** 2 * _LOWER_LEN

    parent = [-1]
    anchor = [(0.0, 0.0, 0.0)]
    axis = [(0.0, 0.0, 1.0)]
    com = [(0.0, 0.0, 0.0)]
    mass = [tm]
    inertia = [p3d.box_inertia(tm, *_TORSO_HALF)]
    contacts = [(0, (hx, hy, 0.0), 0.08)
                for hx in (-_TORSO_HALF[0], _TORSO_HALF[0])
                for hy in (-_TORSO_HALF[1], _TORSO_HALF[1])]

    body = 1
    for (sx, sy) in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        hip = (sx * _TORSO_HALF[0], sy * _TORSO_HALF[1], -_TORSO_HALF[2])
        # hip pitch rotates about the lateral (y) axis; legs swing fore-aft
        parent += [0, body]
        anchor += [hip, (0.0, 0.0, -_UPPER_LEN)]
        axis += [(0.0, 1.0, 0.0), (0.0, 1.0, 0.0)]
        com += [(0.0, 0.0, -_UPPER_LEN / 2), (0.0, 0.0, -_LOWER_LEN / 2)]
        mass += [upper_mass, lower_mass]
        inertia += [um(upper_mass, _UPPER_LEN, _LEG_R, 2),
                    um(lower_mass, _LOWER_LEN, _LEG_R, 2)]
        contacts.append((body + 1, (0.0, 0.0, -_LOWER_LEN), _LEG_R))
        body += 2

    deg = np.deg2rad
    return p3d.Model3D(
        parent=tuple(parent),
        anchor=jnp.asarray(anchor, jnp.float32),
        axis=jnp.asarray(axis, jnp.float32),
        com=jnp.asarray(com, jnp.float32),
        mass=jnp.asarray(mass, jnp.float32),
        inertia=jnp.asarray(inertia, jnp.float32),
        contact_body=tuple(c[0] for c in contacts),
        contact_point=jnp.asarray([c[1] for c in contacts], jnp.float32),
        contact_radius=jnp.asarray([c[2] for c in contacts], jnp.float32),
        gear=jnp.asarray([60.0, 40.0] * 4, jnp.float32),
        damping=jnp.asarray([30.0] * 8, jnp.float32),
        limit_lo=jnp.asarray([float(deg(-60)), float(deg(-120))] * 4,
                             jnp.float32),
        limit_hi=jnp.asarray([float(deg(60)), float(deg(10))] * 4,
                             jnp.float32),
        armature=jnp.asarray([0.05] * 8, jnp.float32),
        # position servos like the reference's MJCF actuators (gain 1000,
        # damping 30, quadruped.xml:22,57-66): the action commands a target
        # angle across the joint range — a far more learnable actuation
        # than raw torque for a 14-dof walker
        servo_gain=jnp.asarray([1000.0] * 8, jnp.float32),
        # action=0 commands a statically stable stance (slight bend with
        # the foot under the hip); ranges stay inside the joint limits
        servo_center=jnp.asarray(
            [float(deg(15)), float(deg(-30))] * 4, jnp.float32),
        servo_half=jnp.asarray(
            [float(deg(45)), float(deg(40))] * 4, jnp.float32),
    )


class QuadState(struct.PyTreeNode):
    q: Array
    qd: Array
    touch: Array
    t: Array
    act: Array  # [nj] actuator filter state (filtered servo commands)


def quad_features_single(model: p3d.Model3D, physics: Array) -> Array:
    """[up, 0, x, y, z, vx, vy, vz] (goals/spaces.py quadruped layout).

    up is the torso z-axis / world z-axis dot product (the reference's
    ``torso_upright``, custom_dmc_tasks/quadruped.py:222-224); x/y/z the
    torso root position; vx/vy/vz the torso linear velocity in the BODY
    frame — the reference's ``torso_velocity`` is the torso-site
    velocimeter read (quadruped.py:226-228), so the Move rewards' v[0] is
    body-forward speed, not world-x speed. Cross-engine agreement of
    every entry is checked on shared MuJoCo states in
    tests/test_mujoco_parity.py."""
    ndof = model.ndof
    q, qd = physics[:ndof], physics[ndof:2 * ndof]
    rot = p3d._euler_rot(q[3:6])
    up = rot[2, 2]
    v_body = rot.T @ qd[0:3]
    return jnp.concatenate([jnp.stack([up, jnp.zeros(())]), q[0:3], v_body])


class QuadrupedEnv(Environment):
    def __init__(self, task: str, episode_length: int = 1000) -> None:
        if task not in TASKS:
            raise ValueError(f"Unknown quadruped task {task!r}")
        self.task = task
        self.model = quadruped_model()
        self.episode_length = episode_length
        self.control_dt, self.n_substeps = 0.02, 8
        # exact discrete step of d(act)/dt = (ctrl - act)/tau over control_dt
        self._act_decay = float(np.exp(-self.control_dt / _ACT_TAU))
        ndof = self.model.ndof
        self.spec = EnvSpec(obs_dim=37, action_dim=8, physics_dim=2 * ndof,
                            goal_dim=0, episode_length=episode_length)

    # -- observables -------------------------------------------------------
    def _obs(self, state: QuadState) -> Array:
        q, qd = state.q, state.qd
        rot = p3d._euler_rot(q[3:6])
        return jnp.concatenate([
            q[6:], qd[6:], rot[0], rot[2], q[2:3], qd[0:3], qd[3:6],
            state.act])

    def _physics(self, state: QuadState) -> Array:
        return jnp.concatenate([state.q, state.qd])

    def goal_features(self, physics: Array) -> Array:
        fn = lambda p: quad_features_single(self.model, p)  # noqa: E731
        if physics.ndim == 1:
            return fn(physics)
        flat = physics.reshape(-1, physics.shape[-1])
        out = jax.vmap(fn)(flat)
        return out.reshape(physics.shape[:-1] + (out.shape[-1],))

    # -- rewards ------------------------------------------------------------
    def reward_from_physics(self, physics: Array) -> Array:
        return self.reward_from_features(
            quad_features_single(self.model, physics))

    def reward_from_features(self, feats: Array) -> Array:
        """Task reward as a pure function of the goal-feature vector —
        also the relabel path for FOREIGN (real dm_control) quadruped
        states, whose 56-dim MuJoCo layout cannot map onto this reduced
        8-joint morphology state-for-state but shares the torso-level
        features (data/exorl.py mujoco_quadruped_features)."""
        up = feats[0]
        v = feats[5:8]
        z = feats[4]
        # _upright_reward (reference quadruped.py:352-366)
        upright = tolerance(up, (1.0, float("inf")), margin=2.0,
                            value_at_margin=0.0, sigmoid="linear")
        if self.task == "stand":
            return upright
        if self.task == "jump":
            jump_up = tolerance(z, (_JUMP_HEIGHT, float("inf")),
                                margin=_JUMP_HEIGHT, value_at_margin=0.5,
                                sigmoid="linear")
            return upright * jump_up
        if self.task in ("roll", "roll_fast"):
            speed = _WALK_SPEED if self.task == "roll" else _RUN_SPEED
            move = tolerance(jnp.linalg.norm(v), (speed, float("inf")),
                             margin=speed, value_at_margin=0.5,
                             sigmoid="linear")
            return upright * move
        speed = _WALK_SPEED if self.task == "walk" else _RUN_SPEED
        move = tolerance(v[0], (speed, float("inf")), margin=speed,
                         value_at_margin=0.5, sigmoid="linear")
        return upright * move

    # -- API ------------------------------------------------------------
    def reset(self, key: jax.Array) -> tp.Tuple[QuadState, TimeStep]:
        nj = 8
        u = jax.random.uniform(key, (nj,), minval=-0.1, maxval=0.1)
        base = jnp.tile(jnp.asarray([0.3, -0.6]), 4)  # crouched stance
        q = jnp.concatenate([
            jnp.asarray([0.0, 0.0, _INIT_Z, 0.0, 0.0, 0.0]), base + u])
        state = QuadState(q=q, qd=jnp.zeros(self.model.ndof),
                          touch=jnp.zeros_like(self.model.contact_radius),
                          t=jnp.zeros((), jnp.int32), act=jnp.zeros(nj))
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self._obs(state),
            action=jnp.zeros(nj),
            physics=self._physics(state),
        )
        return state, ts

    def _filter_act(self, act: Array, action: Array) -> Array:
        return action + (act - action) * self._act_decay

    def step(self, state: QuadState, action: Array
             ) -> tp.Tuple[QuadState, TimeStep]:
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        act = self._filter_act(state.act, action)
        q, qd, touch = p3d.step(self.model, state.q, state.qd, act,
                                self.control_dt, self.n_substeps)
        t = state.t + 1
        new_state = QuadState(q=q, qd=qd, touch=touch, t=t, act=act)
        physics = self._physics(new_state)
        ts = TimeStep(
            step_type=jnp.where(t >= self.episode_length, StepType.LAST,
                                StepType.MID).astype(jnp.int32),
            reward=self.reward_from_physics(physics).astype(jnp.float32),
            discount=jnp.ones(()),
            observation=self._obs(new_state),
            action=action,
            physics=physics,
        )
        return new_state, ts


def _upright(physics_feats: Array, deviation_deg: float = 0.0) -> Array:
    """_upright_reward (reference quadruped.py:352-366)."""
    # Python math, not jnp: tolerance() bounds must be static under jit.
    dev = float(np.cos(np.deg2rad(deviation_deg)))
    return tolerance(physics_feats[0], (dev, float("inf")),
                     margin=1.0 + dev, value_at_margin=0.0, sigmoid="linear")


class EscapeState(struct.PyTreeNode):
    q: Array
    qd: Array
    touch: Array
    t: Array
    act: Array
    terrain: Array  # [res, res] world-z heights


def generate_terrain(key: jax.Array) -> Array:
    """Sinusoidal bowl x random smooth bumps (reference quadruped.py:541-556).

    The reference zooms a `uniform(smoothness, 1)` bump grid (cell size
    ~_TERRAIN_BUMP_SCALE metres) up to the heightfield resolution with a
    spline; here `jax.image.resize(..., "linear")` does the smoothing.
    """
    res = _TERRAIN_RES
    grid = jnp.linspace(-1.0, 1.0, res)
    gx, gy = jnp.meshgrid(grid, grid, indexing="xy")
    radius = jnp.clip(jnp.sqrt(gx ** 2 + gy ** 2), 0.04, 1.0)
    bowl = 0.5 - jnp.cos(2 * jnp.pi * radius) / 2.0
    bump_res = int(2 * _TERRAIN_HALF / _TERRAIN_BUMP_SCALE)
    bumps = jax.random.uniform(key, (bump_res, bump_res),
                               minval=_TERRAIN_SMOOTHNESS, maxval=1.0)
    smooth = jax.image.resize(bumps, (res, res), method="linear")
    return bowl * smooth * _TERRAIN_ZMAX


class QuadrupedEscapeEnv(QuadrupedEnv):
    """Escape a bowl-shaped terrain (reference quadruped.py Escape, :539-591)."""

    def __init__(self, episode_length: int = 1000) -> None:
        super().__init__("stand", episode_length=episode_length)
        self.task = "escape"
        ndof = self.model.ndof
        self.spec = EnvSpec(obs_dim=37 + 3 + _N_RANGEFINDERS, action_dim=8,
                            physics_dim=2 * ndof, goal_dim=0,
                            episode_length=episode_length)
        # forward fan of downward-pitched rays (reference rf_* sites,
        # quadruped.xml:101-120): azimuth in [-40°, 40°], pitch -30°
        az = jnp.linspace(-0.7, 0.7, _N_RANGEFINDERS)
        pitch = -jnp.pi / 6
        self._ray_dirs = jnp.stack([
            jnp.cos(az) * jnp.cos(pitch), jnp.sin(az) * jnp.cos(pitch),
            jnp.full_like(az, jnp.sin(pitch))], axis=1)  # [R,3] torso frame

    def _hfield(self, terrain: Array) -> p3d.Heightfield:
        return p3d.Heightfield(data=terrain, half_size=_TERRAIN_HALF)

    def _escape_obs(self, state: EscapeState) -> Array:
        base = super()._obs(state)  # joint/torso obs (terrain-independent)
        rot = p3d._euler_rot(state.q[3:6])
        pos = state.q[0:3]
        origin = -pos @ rot  # origin position in torso frame
        # rangefinder: fixed-step ray march against the heightfield;
        # no intersection within max range -> 1.0, else tanh(distance)
        # (reference Physics.rangefinder, quadruped.py:263-269)
        hf = self._hfield(state.terrain)
        ray_o = pos + rot @ jnp.asarray([_TORSO_HALF[0], 0.0, 0.0])
        dirs_w = self._ray_dirs @ rot.T  # [R,3] world
        ts = jnp.linspace(0.25, 4.0, 16)  # sample distances along ray
        pts = ray_o[None, None, :] + ts[None, :, None] * dirs_w[:, None, :]
        ground = jax.vmap(jax.vmap(lambda p: p3d.hf_height(hf, p[:2])))(pts)
        below = pts[..., 2] <= ground
        hit_any = jnp.any(below, axis=1)
        first = jnp.argmax(below, axis=1)
        dist = ts[first]
        readings = jnp.where(hit_any, jnp.tanh(dist), 1.0)
        return jnp.concatenate([base, origin, readings])

    def reward_from_physics(self, physics: Array) -> Array:
        feats = quad_features_single(self.model, physics)
        escape = tolerance(jnp.linalg.norm(feats[2:5]),
                           (_TERRAIN_HALF, float("inf")),
                           margin=_TERRAIN_HALF, value_at_margin=0.0,
                           sigmoid="linear")
        return _upright(feats, deviation_deg=20.0) * escape

    def reset(self, key: jax.Array) -> tp.Tuple[EscapeState, TimeStep]:
        k_terrain, k_joints = jax.random.split(key)
        terrain = generate_terrain(k_terrain)
        base_state, _ = super().reset(k_joints)
        z0 = p3d.hf_height(self._hfield(terrain), jnp.zeros(2))
        q = base_state.q.at[2].add(z0)
        state = EscapeState(q=q, qd=base_state.qd, touch=base_state.touch,
                            t=base_state.t, act=base_state.act,
                            terrain=terrain)
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self._escape_obs(state),
            action=jnp.zeros(8),
            physics=self._physics(state),
        )
        return state, ts

    def step(self, state: EscapeState, action: Array
             ) -> tp.Tuple[EscapeState, TimeStep]:
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        act = self._filter_act(state.act, action)
        q, qd, touch = p3d.step(self.model, state.q, state.qd, act,
                                self.control_dt, self.n_substeps,
                                hfield=self._hfield(state.terrain))
        t = state.t + 1
        new_state = EscapeState(q=q, qd=qd, touch=touch, t=t, act=act,
                                terrain=state.terrain)
        physics = self._physics(new_state)
        ts = TimeStep(
            step_type=jnp.where(t >= self.episode_length, StepType.LAST,
                                StepType.MID).astype(jnp.int32),
            reward=self.reward_from_physics(physics).astype(jnp.float32),
            discount=jnp.ones(()),
            observation=self._escape_obs(new_state),
            action=action,
            physics=physics,
        )
        return new_state, ts


class FetchState(struct.PyTreeNode):
    q: Array
    qd: Array
    touch: Array
    t: Array
    act: Array
    ball_pos: Array  # [3]
    ball_vel: Array  # [3]
    ball_angvel: Array  # [3]


class QuadrupedFetchEnv(QuadrupedEnv):
    """Bring a ball to the origin target (reference quadruped.py Fetch, :594-646)."""

    def __init__(self, episode_length: int = 1000) -> None:
        super().__init__("stand", episode_length=episode_length)
        self.task = "fetch"
        ndof = self.model.ndof
        self.spec = EnvSpec(obs_dim=37 + 9 + 3, action_dim=8,
                            physics_dim=2 * ndof + 9, goal_dim=0,
                            episode_length=episode_length)

    # -- ball dynamics ----------------------------------------------------
    def _ball_substep(self, pos: Array, vel: Array, angvel: Array,
                      robot_pts: Array, robot_vels: Array, robot_r: Array,
                      h: float) -> tp.Tuple[Array, Array, Array]:
        k, d = 4.0e3, 20.0
        inertia = 0.4 * _BALL_MASS * _BALL_RADIUS ** 2
        force = jnp.asarray([0.0, 0.0, -p3d.GRAVITY * _BALL_MASS])
        torque = jnp.zeros(3)
        # ground (spring-damper + slip friction driving spin)
        phi = _BALL_RADIUS - pos[2]
        fn = jnp.where(phi > 0, jnp.maximum(k * phi - d * vel[2], 0.0), 0.0)
        # surface slip velocity at the contact point: v + omega x r_c,
        # r_c = (0, 0, -R)  ->  xy components (-R*wy, +R*wx)
        contact_v = vel[:2] + jnp.stack(
            [-angvel[1], angvel[0]]) * _BALL_RADIUS
        ft = -0.7 * fn * jnp.clip(contact_v / 0.1, -1.0, 1.0)
        force = force + jnp.concatenate([ft, fn[None]])
        r_c = jnp.asarray([0.0, 0.0, -_BALL_RADIUS])
        torque = torque + jnp.cross(r_c, jnp.concatenate([ft, fn[None]]))
        # boundary walls at +-_FLOOR_HALF (reference quadruped.xml:78-81)
        over = jnp.maximum(jnp.abs(pos[:2]) - (_FLOOR_HALF - _BALL_RADIUS),
                           0.0)
        force = force.at[:2].add(-k * over * jnp.sign(pos[:2])
                                 - d * (over > 0) * vel[:2])
        # robot collision spheres -> ball (one-way coupling)
        delta = pos[None, :] - robot_pts  # [nc,3]
        dist = jnp.linalg.norm(delta, axis=1) + 1e-8
        pen = jnp.maximum(robot_r + _BALL_RADIUS - dist, 0.0)
        n = delta / dist[:, None]
        rel_v = jnp.einsum("ci,ci->c", vel[None, :] - robot_vels, n)
        f_c = jnp.maximum(k * pen - d * rel_v * (pen > 0), 0.0) * (pen > 0)
        force = force + jnp.einsum("c,ci->i", f_c, n)
        vel = vel + h * force / _BALL_MASS
        angvel = angvel + h * torque / inertia
        pos = pos + h * vel
        return pos, vel, angvel

    def goal_features(self, physics: Array) -> Array:
        """Base quadruped features (8) + ball position (3) — the ball
        columns feed the ``quadruped_positions`` goal space (reference
        goals.py:116-120, registered only for fetch because the ball must
        be present)."""
        base = super().goal_features(physics)
        ndof = self.model.ndof
        ball = physics[..., 2 * ndof:2 * ndof + 3]
        return jnp.concatenate([base, ball], axis=-1)

    def _obs_fetch(self, state: FetchState) -> Array:
        base = super()._obs(state)
        rot = p3d._euler_rot(state.q[3:6])
        pos = state.q[0:3]
        rel_pos = (state.ball_pos - pos) @ rot
        rel_vel = (state.ball_vel - state.qd[0:3]) @ rot
        angvel = state.ball_angvel @ rot
        target = -pos @ rot  # target is at the origin
        return jnp.concatenate([base, rel_pos, rel_vel, angvel, target])

    def _physics(self, state) -> Array:  # type: ignore[override]
        base = jnp.concatenate([state.q, state.qd])
        if isinstance(state, FetchState):
            return jnp.concatenate([base, state.ball_pos, state.ball_vel,
                                    state.ball_angvel])
        return base

    def reward_from_physics(self, physics: Array) -> Array:
        ndof = self.model.ndof
        feats = quad_features_single(self.model, physics)
        ball_pos = physics[2 * ndof:2 * ndof + 3]
        rot = p3d._euler_rot(physics[3:6])
        workspace = physics[0:3] + rot @ jnp.asarray(_WORKSPACE_OFFSET)
        arena_radius = _FLOOR_HALF * float(np.sqrt(2.0))
        reach = tolerance(
            jnp.linalg.norm((workspace - ball_pos)[:2]),
            (0.0, _WORKSPACE_RADIUS + _BALL_RADIUS),
            margin=arena_radius, value_at_margin=0.0, sigmoid="linear")
        fetch = tolerance(
            jnp.linalg.norm(ball_pos[:2]), (0.0, _TARGET_RADIUS),
            margin=arena_radius, value_at_margin=0.0, sigmoid="linear")
        return _upright(feats) * reach * (0.5 + 0.5 * fetch)

    def reset(self, key: jax.Array) -> tp.Tuple[FetchState, TimeStep]:
        k_base, k_yaw, k_xy, k_ball, k_bv = jax.random.split(key, 5)
        base_state, _ = super().reset(k_base)
        spawn = 0.9 * _FLOOR_HALF
        yaw = jax.random.uniform(k_yaw, (), minval=0.0, maxval=2 * jnp.pi)
        xy = jax.random.uniform(k_xy, (2,), minval=-spawn, maxval=spawn)
        q = base_state.q.at[0:2].set(xy).at[5].set(yaw)
        ball_xy = jax.random.uniform(k_ball, (2,), minval=-spawn,
                                     maxval=spawn)
        ball_pos = jnp.concatenate([ball_xy, jnp.asarray([2.0])])
        ball_vel = jnp.concatenate([5.0 * jax.random.normal(k_bv, (2,)),
                                    jnp.zeros(1)])
        state = FetchState(q=q, qd=base_state.qd, touch=base_state.touch,
                           t=base_state.t, act=base_state.act,
                           ball_pos=ball_pos, ball_vel=ball_vel,
                           ball_angvel=jnp.zeros(3))
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self._obs_fetch(state),
            action=jnp.zeros(8),
            physics=self._physics(state),
        )
        return state, ts

    def step(self, state: FetchState, action: Array
             ) -> tp.Tuple[FetchState, TimeStep]:
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        act = self._filter_act(state.act, action)
        q, qd, touch = p3d.step(self.model, state.q, state.qd, act,
                                self.control_dt, self.n_substeps)
        # ball integrated against the robot's post-step collision spheres
        # (one control step of lag in the coupling is acceptable at 20 ms)
        pts = p3d.contact_world(self.model, q)
        jac = jax.jacfwd(lambda qq: p3d.contact_world(self.model, qq))(q)
        pt_vels = jnp.einsum("cid,d->ci", jac, qd)
        h = self.control_dt / self.n_substeps
        def sub(carry, _):
            pos, vel, av = carry
            return self._ball_substep(pos, vel, av, pts, pt_vels,
                                      self.model.contact_radius, h), None
        (ball_pos, ball_vel, ball_av), _ = jax.lax.scan(
            sub, (state.ball_pos, state.ball_vel, state.ball_angvel), None,
            length=self.n_substeps)
        t = state.t + 1
        new_state = FetchState(q=q, qd=qd, touch=touch, t=t, act=act,
                               ball_pos=ball_pos, ball_vel=ball_vel,
                               ball_angvel=ball_av)
        physics = self._physics(new_state)
        ts = TimeStep(
            step_type=jnp.where(t >= self.episode_length, StepType.LAST,
                                StepType.MID).astype(jnp.int32),
            reward=self.reward_from_physics(physics).astype(jnp.float32),
            discount=jnp.ones(()),
            observation=self._obs_fetch(new_state),
            action=action,
            physics=physics,
        )
        return new_state, ts


def make(name: str, episode_length: int = 1000) -> QuadrupedEnv:
    domain, task = name.split("_", 1)
    assert domain == "quadruped"
    if task == "escape":
        return QuadrupedEscapeEnv(episode_length=episode_length)
    if task == "fetch":
        return QuadrupedFetchEnv(episode_length=episode_length)
    return QuadrupedEnv(task, episode_length=episode_length)
