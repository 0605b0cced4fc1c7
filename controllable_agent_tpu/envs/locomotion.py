"""Walker / Cheetah / Hopper — planar locomotion on the pure-JAX engine.

Re-creates the reference's locomotion domains and custom task set
(url_benchmark/custom_dmc_tasks/walker.py, cheetah.py, hopper.py + the
standard dm_control suite tasks they extend) on top of
``physics2d``. Geometry approximates the standard DeepMind planar models
(capsule links, hinge joints, comparable link lengths/gears/limits); the
dynamics are this framework's own analytic engine, so numerical
trajectories are NOT MuJoCo-identical — task semantics, observation
layouts, reward shapes and goal spaces are.

Tasks (reference lines):
  walker  stand/walk/run (+ flip, walker.py:83-98, speeds 1/8, spin 5)
  cheetah walk/run + backwards + flips (cheetah.py:71-140, speeds 2/10)
  hopper  stand/hop/hop_backward + flips (hopper.py:83-121, hop 2)

Observations match the reference layouts:
  walker: orientations (cos/sin per body, 14) + torso height + qvel  -> 24
  cheetah: qpos[1:] (8) + qvel (9)                                   -> 17
  hopper: qpos[1:] (6) + qvel (7) + log1p(touch toe/heel) (2)        -> 15

The TimeStep ``physics`` vector is [q, qd] — everything (rewards, goal
features) is a pure function of it, so batched relabeling is one vmap.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.tolerance import tolerance
from . import physics2d as p2d
from .base import Environment, EnvSpec, StepType, TimeStep

Array = jnp.ndarray


# ================================================================ models

def _build_model(parent: tp.List[int], anchor: tp.List[tp.Tuple[float, float]],
                 com: tp.List[tp.Tuple[float, float]],
                 mass: tp.List[float], inertia: tp.List[float],
                 contacts: tp.List[tp.Tuple[int, tp.Tuple[float, float], float]],
                 gear: tp.List[float], damping: tp.List[float],
                 limits: tp.List[tp.Tuple[float, float]],
                 armature: tp.List[float], **kwargs: tp.Any) -> p2d.PlanarModel:
    lo = [l[0] for l in limits]
    hi = [l[1] for l in limits]
    return p2d.PlanarModel(
        parent=tuple(parent),
        anchor=jnp.asarray(anchor, jnp.float32),
        com=jnp.asarray(com, jnp.float32),
        mass=jnp.asarray(mass, jnp.float32),
        inertia=jnp.asarray(inertia, jnp.float32),
        contact_body=tuple(c[0] for c in contacts),
        contact_point=jnp.asarray([c[1] for c in contacts], jnp.float32),
        contact_radius=jnp.asarray([c[2] for c in contacts], jnp.float32),
        gear=jnp.asarray(gear, jnp.float32),
        damping=jnp.asarray(damping, jnp.float32),
        limit_lo=jnp.asarray(lo, jnp.float32),
        limit_hi=jnp.asarray(hi, jnp.float32),
        armature=jnp.asarray(armature, jnp.float32),
        **kwargs,
    )


def _deg(lo: float, hi: float) -> tp.Tuple[float, float]:
    return (float(np.deg2rad(lo)), float(np.deg2rad(hi)))


def walker_model() -> p2d.PlanarModel:
    """7 bodies: torso, R thigh/leg/foot, L thigh/leg/foot. 9 dof."""
    r_t, l_t = 0.07, 0.6  # torso radius / length (vertical capsule)
    r_th, l_th = 0.05, 0.45
    r_lg, l_lg = 0.04, 0.5
    r_ft, l_ft = 0.05, 0.2  # foot points forward
    m = [p2d.capsule_mass(r_t, l_t), ]
    inertia = [p2d.capsule_inertia(r_t, l_t)]
    for (r, l) in [(r_th, l_th), (r_lg, l_lg), (r_ft, l_ft)] * 2:
        m.append(p2d.capsule_mass(r, l))
        inertia.append(p2d.capsule_inertia(r, l))
    hip = (0.0, -l_t / 2)
    # foot COM sits 0.06 ahead of the ankle (dm_control walker.xml: foot
    # body pos x=.06 with the ankle at x=-.06 in the foot frame), so the
    # capsule spans x ∈ [-0.04, 0.16] relative to the ankle — verified
    # against the model's body_ipos/xipos
    ft_com = 0.06
    return _build_model(
        parent=[-1, 0, 1, 2, 0, 4, 5],
        anchor=[(0, 0), hip, (0.0, -l_th), (0.0, -l_lg),
                hip, (0.0, -l_th), (0.0, -l_lg)],
        com=[(0, 0), (0, -l_th / 2), (0, -l_lg / 2), (ft_com, 0)] +
            [(0, -l_th / 2), (0, -l_lg / 2), (ft_com, 0)],
        mass=m, inertia=inertia,
        contacts=[(0, (0.0, l_t / 2), r_t), (0, (0.0, -l_t / 2), r_t),
                  (3, (ft_com - l_ft / 2, 0.0), r_ft),
                  (3, (ft_com + l_ft / 2, 0.0), r_ft),
                  (6, (ft_com - l_ft / 2, 0.0), r_ft),
                  (6, (ft_com + l_ft / 2, 0.0), r_ft)],
        gear=[100, 50, 20, 100, 50, 20],
        damping=[0.1] * 6,
        limits=[_deg(-20, 100), _deg(-150, 0), _deg(-45, 45)] * 2,
        armature=[0.01] * 6,
    )


WALKER_INIT_Z = 1.3  # torso-center height with straight legs
WALKER_STAND_HEIGHT = 1.2


def cheetah_model() -> p2d.PlanarModel:
    """7 bodies: torso (horizontal), back thigh/shin/foot, front
    thigh/shin/foot. 9 dof.

    Geometry, joint springs/damping/limits/gears, friction and the total
    mass rescale (settotalmass=14) follow the reference MJCF
    (custom_dmc_tasks/cheetah.xml:8-72). The zero pose is the *bent*
    stance encoded by the MJCF body offsets — the legs zigzag, and each
    joint is spring-loaded toward that stance."""
    r = 0.046
    # per-leg geoms: (com in body frame, capsule axis angle about y in
    # deg, capsule half-length) straight from the MJCF
    leg_geoms = [((0.1, -0.13), -218.0, 0.145),    # bthigh
                 ((-0.14, -0.07), -116.0, 0.15),   # bshin
                 ((0.03, -0.097), -15.0, 0.094),   # bfoot
                 ((-0.07, -0.12), 30.0, 0.133),    # fthigh
                 ((0.065, -0.09), -34.0, 0.106),   # fshin
                 ((0.045, -0.07), -34.0, 0.07)]    # ffoot
    # torso = main capsule (l=1) + head capsule folded in (parallel axis)
    m_t = p2d.capsule_mass(r, 1.0)
    m_h = p2d.capsule_mass(r, 0.3)
    head_com = np.asarray([0.6, 0.1])
    com0 = (m_h * head_com) / (m_t + m_h)
    i0 = (p2d.capsule_inertia(r, 1.0) + m_t * float((com0 ** 2).sum())
          + p2d.capsule_inertia(r, 0.3)
          + m_h * float(((head_com - com0) ** 2).sum()))
    mass = [m_t + m_h]
    inertia = [i0]
    com = [tuple(com0)]
    for (c, _, hl) in leg_geoms:
        mass.append(p2d.capsule_mass(r, 2 * hl))
        inertia.append(p2d.capsule_inertia(r, 2 * hl))
        com.append(c)
    scale = 14.0 / sum(mass)  # MJCF compiler settotalmass="14"
    mass = [m * scale for m in mass]
    inertia = [i * scale for i in inertia]

    def ends(gi: int) -> tp.List[tp.Tuple[float, float]]:
        (cx, cz), a, hl = leg_geoms[gi]
        d = np.asarray([np.sin(np.deg2rad(a)), np.cos(np.deg2rad(a))])
        return [(cx + hl * d[0], cz + hl * d[1]),
                (cx - hl * d[0], cz - hl * d[1])]

    bshin_lo = min(ends(1), key=lambda e: e[1])
    fshin_lo = min(ends(4), key=lambda e: e[1])
    head_tip = (0.6 + 0.15 * np.sin(np.deg2rad(50)),
                0.1 + 0.15 * np.cos(np.deg2rad(50)))
    contacts = ([(0, (-0.5, 0.0), r), (0, (0.5, 0.0), r),
                 (0, head_tip, r), (2, bshin_lo, r), (5, fshin_lo, r)]
                + [(3, e, r) for e in ends(2)]
                + [(6, e, r) for e in ends(5)])
    return _build_model(
        parent=[-1, 0, 1, 2, 0, 4, 5],
        anchor=[(0, 0), (-0.5, 0), (0.16, -0.25), (-0.28, -0.14),
                (0.5, 0), (-0.14, -0.24), (0.13, -0.18)],
        com=com, mass=mass, inertia=inertia,
        contacts=contacts,
        gear=[120, 90, 60, 90, 60, 30],
        damping=[6.0, 4.5, 3.0, 4.5, 3.0, 1.5],
        # MJCF ranges are about the +y hinge axis (cheetah.xml joints);
        # this engine's positive hinge rotation is the OPPOSITE physical
        # direction (CCW x→z), so each range maps to (-hi, -lo)
        limits=[_deg(-60, 30), _deg(-50, 50), _deg(-50, 230),
                _deg(-0.4, 57), _deg(-50, 70), _deg(-28, 28)],
        armature=[0.1] * 6,
        stiffness=jnp.asarray([240.0, 180.0, 120.0, 180.0, 120.0, 60.0]),
        friction=0.4,
    )


CHEETAH_INIT_Z = 0.7


def hopper_model() -> p2d.PlanarModel:
    """5 bodies: torso(root), pelvis, thigh, calf, foot. 7 dof.

    Geometry and joint params follow the reference MJCF
    (custom_dmc_tasks/hopper.xml:10-64): torso capsule (0,-.05)..(0,.2),
    pelvis .15, thigh .33, calf .32, forward foot (-.08,0)..(.17,0);
    damping .05 / armature .2 on every joint (the class defaults)."""
    # (radius, length, com in body frame)
    geoms = [(0.0653, 0.25, (0.0, 0.075)),    # torso
             (0.065, 0.15, (0.0, -0.075)),    # pelvis
             (0.04, 0.33, (0.0, -0.165)),     # thigh
             (0.03, 0.32, (0.0, -0.16)),      # calf
             (0.04, 0.25, (0.045, 0.0))]      # foot (forward)
    m = []
    inertia = []
    for (r, l, _) in geoms:
        m.append(p2d.capsule_mass(r, l))
        inertia.append(p2d.capsule_inertia(r, l))
    # torso also carries the nose geom: use the real model's torso mass /
    # COM / inertia (dm_control hopper body_mass[torso]=4.828,
    # body_ipos=(0.0075, 0.0789), body_inertia_y=0.0497)
    m[0], inertia[0] = 4.828, 0.0497
    com = [g[2] for g in geoms]
    com[0] = (0.0075, 0.0789)
    return _build_model(
        parent=[-1, 0, 1, 2, 3],
        anchor=[(0, 0), (0.0, -0.05), (0.0, -0.2), (0.0, -0.33),
                (0.0, -0.32)],
        com=com,
        mass=m, inertia=inertia,
        # toe and heel contacts (touch sensors), plus torso top for falls
        contacts=[(0, (0.0, 0.2), geoms[0][0]),
                  (4, (0.17, 0.0), 0.04),    # toe
                  (4, (-0.08, 0.0), 0.04)],  # heel
        gear=[30, 40, 30, 10],
        damping=[0.05] * 4,
        # MJCF ranges are about the +y hinge axis (hopper.xml joints);
        # native positive rotation is the opposite physical direction, so
        # each range maps to (-hi, -lo)
        limits=[_deg(-30, 30), _deg(-10, 170), _deg(-150, -5), _deg(-45, 45)],
        armature=[0.2] * 4,
    )


HOPPER_INIT_Z = 1.0  # root (torso-origin) height, hopper.xml:26
HOPPER_STAND_HEIGHT = 0.6

_MODELS: tp.Dict[str, tp.Callable[[], p2d.PlanarModel]] = {
    "walker": walker_model, "cheetah": cheetah_model, "hopper": hopper_model}
_INIT_Z = {"walker": WALKER_INIT_Z, "cheetah": CHEETAH_INIT_Z,
           "hopper": HOPPER_INIT_Z}
_CONTROL = {"walker": (0.025, 10), "cheetah": (0.01, 4), "hopper": (0.02, 8)}

_SPIN_SPEED = 5.0
_SPEEDS = {
    ("walker", "stand"): 0.0, ("walker", "walk"): 1.0, ("walker", "run"): 8.0,
    ("cheetah", "walk"): 2.0, ("cheetah", "run"): 10.0,
    ("cheetah", "walk_backward"): 2.0, ("cheetah", "run_backward"): 10.0,
    ("hopper", "stand"): 0.0, ("hopper", "hop"): 2.0,
    ("hopper", "hop_backward"): 2.0,
}

TASKS = {
    "walker": ["stand", "walk", "run", "flip"],
    "cheetah": ["walk", "run", "walk_backward", "run_backward", "flip",
                "flip_backward"],
    "hopper": ["stand", "hop", "hop_backward", "flip", "flip_backward"],
}


# ==================================================== physics observables

def _split_qqd(model: p2d.PlanarModel, physics: Array) -> tp.Tuple[Array, Array]:
    ndof = model.ndof
    return physics[..., :ndof], physics[..., ndof:2 * ndof]


def walker_features_single(model: p2d.PlanarModel, physics: Array) -> Array:
    """[x, z, up, vx, vz, am] — the walker goal-feature layout consumed by
    goals/spaces.py (reference variables: goals.py:66-94, 509-545)."""
    q, qd = _split_qqd(model, physics)
    v_com, l_y, _ = p2d.subtree_momentum(model, q, qd)
    return jnp.stack([q[0], q[1], jnp.cos(q[2]), v_com[0], v_com[1], l_y])


class LocoState(struct.PyTreeNode):
    q: Array
    qd: Array
    touch: Array
    t: Array


class LocomotionEnv(Environment):
    """Planar locomotion env over physics2d; pure reset/step."""

    def __init__(self, domain: str, task: str,
                 episode_length: int = 1000) -> None:
        if task not in TASKS[domain]:
            raise ValueError(f"Unknown {domain} task {task!r}")
        self.domain = domain
        self.task = task
        self.model = _MODELS[domain]()
        self.init_z = _INIT_Z[domain]
        self.control_dt, self.n_substeps = _CONTROL[domain]
        self.episode_length = episode_length
        ndof = self.model.ndof
        nj = ndof - 3
        obs_dim = {"walker": 2 * self.model.nb + 1 + ndof,
                   "cheetah": (ndof - 1) + ndof,
                   "hopper": (ndof - 1) + ndof + 2}[domain]
        self.spec = EnvSpec(obs_dim=obs_dim, action_dim=nj,
                            physics_dim=2 * ndof, goal_dim=0,
                            episode_length=episode_length)

    # -- observables -----------------------------------------------------
    def _obs(self, state: LocoState) -> Array:
        q, qd = state.q, state.qd
        if self.domain == "walker":
            _, angles = p2d.fk(self.model, q)
            orient = jnp.stack([jnp.cos(angles), jnp.sin(angles)], -1).ravel()
            return jnp.concatenate([orient, q[1:2], qd])
        if self.domain == "cheetah":
            return jnp.concatenate([q[1:], qd])
        # hopper: qpos[1:] + qvel + log1p(touch toe/heel)
        touch = jnp.log1p(state.touch[1:3])
        return jnp.concatenate([q[1:], qd, touch])

    def _physics(self, state: LocoState) -> Array:
        return jnp.concatenate([state.q, state.qd])

    def obs_from_physics(self, physics: Array) -> Array:
        """Observation as a pure function of [q, qd], batched over leading
        dims. Used to RECOMPUTE the observation column when ingesting
        foreign-engine episodes (data/exorl.py physics adapters): stored
        dm_control observations follow MuJoCo's hinge sign convention
        (x->-z), this engine's is mirrored (x->z), so orientations/angular
        rates in stored obs disagree with what this engine would emit on
        the same states — recomputing from adapted physics keeps the
        whole buffer in the native convention. Hopper obs includes touch
        sensors which are not part of [q, qd]; they are approximated as 0
        (document- and test-gated)."""
        ndof = self.model.ndof

        def single(p: Array) -> Array:
            state = LocoState(q=p[:ndof], qd=p[ndof:],
                              touch=jnp.zeros_like(self.model.contact_radius),
                              t=jnp.zeros((), jnp.int32))
            return self._obs(state)

        if physics.ndim == 1:
            return single(physics)
        flat = physics.reshape(-1, physics.shape[-1])
        out = jax.vmap(single)(flat)
        return out.reshape(physics.shape[:-1] + (out.shape[-1],))

    def goal_features(self, physics: Array) -> Array:
        """Domain goal-feature extraction, batched over leading dims."""
        fn = {
            "walker": lambda p: walker_features_single(self.model, p),
            "cheetah": lambda p: walker_features_single(self.model, p),
            "hopper": lambda p: walker_features_single(self.model, p),
        }[self.domain]
        if physics.ndim == 1:
            return fn(physics)
        flat = physics.reshape(-1, physics.shape[-1])
        out = jax.vmap(fn)(flat)
        return out.reshape(physics.shape[:-1] + (out.shape[-1],))

    # -- rewards ---------------------------------------------------------
    def reward_from_physics(self, physics: Array) -> Array:
        """Task reward as a pure function of [q, qd] (single sample)."""
        feats = (walker_features_single(self.model, physics))
        x, z, up, vx, vz, am = (feats[i] for i in range(6))
        q, qd = _split_qqd(self.model, physics)
        domain, task = self.domain, self.task
        forward = -1.0 if task.endswith("backward") else 1.0
        base = task.replace("_backward", "")
        if domain == "walker":
            standing = tolerance(z, (WALKER_STAND_HEIGHT, float("inf")),
                                 margin=WALKER_STAND_HEIGHT / 2)
            upright = (1 + up) / 2
            stand_reward = (3 * standing + upright) / 4
            if base == "flip":
                move = tolerance(forward * am, (_SPIN_SPEED, float("inf")),
                                 margin=_SPIN_SPEED, value_at_margin=0,
                                 sigmoid="linear")
            else:
                speed = _SPEEDS[(domain, base)]
                if speed == 0:
                    return stand_reward
                move = tolerance(forward * vx, (speed, float("inf")),
                                 margin=speed / 2, value_at_margin=0.5,
                                 sigmoid="linear")
            return stand_reward * (5 * move + 1) / 6
        if domain == "cheetah":
            if base == "flip":
                return tolerance(forward * am, (_SPIN_SPEED, float("inf")),
                                 margin=_SPIN_SPEED, value_at_margin=0,
                                 sigmoid="linear")
            speed = _SPEEDS[(domain, base)]
            return tolerance(forward * vx, (speed, float("inf")),
                             margin=speed, value_at_margin=0,
                             sigmoid="linear")
        # hopper: height of torso COM over foot COM (reference
        # physics.height(), dm_control hopper xipos difference)
        coms, _ = p2d.com_world(self.model, q)
        height = coms[0, 1] - coms[-1, 1]
        standing = tolerance(height, (HOPPER_STAND_HEIGHT, 2.0))
        if base == "stand":
            return standing
        if base == "flip":
            hopping = tolerance(forward * am, (_SPIN_SPEED, float("inf")),
                                margin=_SPIN_SPEED, value_at_margin=0,
                                sigmoid="linear")
        else:
            speed = _SPEEDS[(domain, "hop")]
            hopping = tolerance(forward * vx, (speed, float("inf")),
                                margin=speed / 2, value_at_margin=0.5,
                                sigmoid="linear")
        return standing * hopping

    # -- API -------------------------------------------------------------
    def reset(self, key: jax.Array) -> tp.Tuple[LocoState, TimeStep]:
        nj = self.model.ndof - 3
        k1, k2 = jax.random.split(key)
        # randomize limited joints within range (reference
        # randomize_limited_and_rotational_joints via initialize_episode)
        u = jax.random.uniform(k1, (nj,))
        qj = self.model.limit_lo + u * (self.model.limit_hi - self.model.limit_lo)
        q = jnp.concatenate([jnp.asarray([0.0, self.init_z, 0.0]), qj])
        qd = jnp.zeros(self.model.ndof)
        if self.domain == "cheetah":
            # stabilize for 2 s of sim before the episode starts (reference
            # Cheetah.initialize_episode steps physics 200×0.01 s,
            # custom_dmc_tasks/cheetah.py:169-172)
            def settle(carry: tp.Tuple[Array, Array], _: None):
                qq, qqd = carry
                qq, qqd, _t = p2d.step(self.model, qq, qqd,
                                       jnp.zeros(nj), self.control_dt,
                                       self.n_substeps)
                return (qq, qqd), None
            n_settle = int(round(2.0 / self.control_dt))
            (q, qd), _ = jax.lax.scan(settle, (q, qd), None, length=n_settle)
        state = LocoState(q=q, qd=qd,
                          touch=jnp.zeros_like(self.model.contact_radius),
                          t=jnp.zeros((), jnp.int32))
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self._obs(state),
            action=jnp.zeros(nj),
            physics=self._physics(state),
        )
        return state, ts

    def step(self, state: LocoState, action: Array
             ) -> tp.Tuple[LocoState, TimeStep]:
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        q, qd, touch = p2d.step(self.model, state.q, state.qd, action,
                                self.control_dt, self.n_substeps)
        t = state.t + 1
        new_state = LocoState(q=q, qd=qd, touch=touch, t=t)
        physics = self._physics(new_state)
        reward = self.reward_from_physics(physics)
        ts = TimeStep(
            step_type=jnp.where(t >= self.episode_length, StepType.LAST,
                                StepType.MID).astype(jnp.int32),
            reward=reward.astype(jnp.float32),
            discount=jnp.ones(()),
            observation=self._obs(new_state),
            action=action,
            physics=physics,
        )
        return new_state, ts


def make(name: str, episode_length: int = 1000) -> LocomotionEnv:
    """'walker_walk' -> LocomotionEnv('walker', 'walk') (reference
    dmc.make name parsing, url_benchmark/dmc.py:388-419)."""
    domain, task = name.split("_", 1)
    return LocomotionEnv(domain, task, episode_length=episode_length)
