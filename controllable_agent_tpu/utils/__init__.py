from .schedules import schedule
from .steps import crossed, frames_remaining, Stopwatch
from .distributions import TruncatedNormal, SquashedNormal
from .prng import KeyChain
from .tree import soft_update, hard_update, param_norm, tree_size
