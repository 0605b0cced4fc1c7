from .registry import Register, goal_spaces, goals
from .rewards import (
    BaseReward,
    MazeMultiGoal,
    PointMassReachReward,
    WalkerEquation,
    get_reward_function,
    get_goal_space_dim,
)
