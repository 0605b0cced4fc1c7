from .base import MetaDict, AgentProtocol
from .fb_ddpg import FBDDPGAgent, FBDDPGConfig, FBTrainState
from .discrete_fb import DiscreteFBAgent, DiscreteFBConfig
from .ddpg import DDPGAgent, DDPGConfig, DDPGTrainState
