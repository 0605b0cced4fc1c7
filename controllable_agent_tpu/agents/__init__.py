from .base import MetaDict, AgentProtocol
from .fb_ddpg import FBDDPGAgent, FBDDPGConfig, FBTrainState
from .discrete_fb import DiscreteFBAgent, DiscreteFBConfig
from .ddpg import DDPGAgent, DDPGConfig, DDPGTrainState
from .sf import SFAgent, SFConfig, SFTrainState, FEATURE_LEARNERS
from .uvf import UVFAgent, UVFConfig
from .sf_svd import SFSVDAgent, SFSVDConfig
from .discrete_sf import DiscreteSFAgent, DiscreteSFConfig
from .aps import APSAgent, APSConfig, NEWAPSAgent, NEWAPSConfig
from .goal_agents import GoalSMAgent, GoalSMConfig, GoalTD3Agent, GoalTD3Config
from .smm import SMMAgent, SMMConfig
from .proto import ProtoAgent, ProtoConfig
from .exploration import (
    DIAYNAgent, DIAYNConfig, DisagreementAgent, DisagreementConfig,
    ICMAgent, ICMAPTAgent, ICMAPTConfig, ICMConfig, MaxEntAgent,
    MaxEntConfig, RNDAgent, RNDConfig)
