from .episode_batch import EpisodeBatch
from .replay import ReplayBuffer, ReplayState, SampleConfig
