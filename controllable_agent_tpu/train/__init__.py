from .logger import Logger
from .loops import make_offline_trainer, make_episode_collector, OnlineTrainer
