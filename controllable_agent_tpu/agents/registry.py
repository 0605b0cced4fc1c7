"""Agent registry: name -> (config class, builder).

Replaces the reference's Hydra ConfigStore group registration
(url_benchmark/agent/fb_ddpg.py:85-86 etc.): ``agent=fb_ddpg`` on the CLI
selects the config node; obs/action dims are injected from the env spec at
build time (reference make_agent, url_benchmark/pretrain.py:112-120).
"""

from __future__ import annotations

import typing as tp

from ..envs.base import EnvSpec
from .ddpg import DDPGAgent, DDPGConfig
from .discrete_fb import DiscreteFBAgent, DiscreteFBConfig
from .fb_ddpg import FBDDPGAgent, FBDDPGConfig
from .sf import SFAgent, SFConfig

AgentBuilder = tp.Callable[[tp.Any, EnvSpec, tp.Optional[int]], tp.Any]

AGENTS: tp.Dict[str, tp.Tuple[type, AgentBuilder]] = {}


def register_agent(name: str, config_cls: type, builder: AgentBuilder) -> None:
    AGENTS[name] = (config_cls, builder)


def make_agent(name: str, cfg: tp.Any, spec: EnvSpec,
               goal_dim: tp.Optional[int] = None) -> tp.Any:
    if name not in AGENTS:
        raise ValueError(f"Unknown agent {name!r}; known: {sorted(AGENTS)}")
    _, builder = AGENTS[name]
    return builder(cfg, spec, goal_dim)


def default_config(name: str) -> tp.Any:
    return AGENTS[name][0]()


register_agent(
    "fb_ddpg", FBDDPGConfig,
    lambda cfg, spec, goal_dim: FBDDPGAgent(
        cfg, obs_dim=spec.obs_dim, action_dim=spec.action_dim,
        goal_dim=goal_dim))

register_agent(
    "discrete_fb", DiscreteFBConfig,
    lambda cfg, spec, goal_dim: DiscreteFBAgent(
        cfg, obs_dim=spec.obs_dim, n_actions=spec.n_actions,
        goal_dim=goal_dim))

register_agent(
    "ddpg", DDPGConfig,
    lambda cfg, spec, goal_dim: DDPGAgent(
        cfg, obs_dim=spec.obs_dim, action_dim=spec.action_dim,
        obs_shape=spec.obs_shape))

register_agent(
    "sf", SFConfig,
    lambda cfg, spec, goal_dim: SFAgent(
        cfg, obs_dim=spec.obs_dim, action_dim=spec.action_dim,
        goal_dim=goal_dim))


def _register_simple(name: str, config_cls: type, agent_cls: type) -> None:
    register_agent(
        name, config_cls,
        lambda cfg, spec, goal_dim: agent_cls(
            cfg, obs_dim=spec.obs_dim, action_dim=spec.action_dim,
            goal_dim=goal_dim))


from .aps import APSAgent, APSConfig, NEWAPSAgent, NEWAPSConfig  # noqa: E402
from .exploration import (  # noqa: E402
    DIAYNAgent, DIAYNConfig, DisagreementAgent, DisagreementConfig,
    ICMAgent, ICMAPTAgent, ICMAPTConfig, ICMConfig, MaxEntAgent,
    MaxEntConfig, RNDAgent, RNDConfig)
from .proto import ProtoAgent, ProtoConfig  # noqa: E402
from .smm import SMMAgent, SMMConfig  # noqa: E402

_register_simple("aps", APSConfig, APSAgent)
_register_simple("new_aps", NEWAPSConfig, NEWAPSAgent)
_register_simple("rnd", RNDConfig, RNDAgent)
_register_simple("diayn", DIAYNConfig, DIAYNAgent)
_register_simple("icm", ICMConfig, ICMAgent)
_register_simple("icm_apt", ICMAPTConfig, ICMAPTAgent)
_register_simple("disagreement", DisagreementConfig, DisagreementAgent)
_register_simple("max_ent", MaxEntConfig, MaxEntAgent)
_register_simple("smm", SMMConfig, SMMAgent)
_register_simple("proto", ProtoConfig, ProtoAgent)

from .discrete_sf import DiscreteSFAgent, DiscreteSFConfig  # noqa: E402
from .goal_agents import (  # noqa: E402
    GoalSMAgent, GoalSMConfig, GoalTD3Agent, GoalTD3Config)
from .sf_svd import SFSVDAgent, SFSVDConfig  # noqa: E402
from .uvf import UVFAgent, UVFConfig  # noqa: E402

_register_simple("uvf", UVFConfig, UVFAgent)
_register_simple("sf_svd", SFSVDConfig, SFSVDAgent)
_register_simple("goal_td3", GoalTD3Config, GoalTD3Agent)
_register_simple("goal_sm", GoalSMConfig, GoalSMAgent)

register_agent(
    "discrete_sf", DiscreteSFConfig,
    lambda cfg, spec, goal_dim: DiscreteSFAgent(
        cfg, obs_dim=spec.obs_dim, n_actions=spec.n_actions,
        goal_dim=goal_dim))
