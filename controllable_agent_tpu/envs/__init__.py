from .base import StepType, TimeStep, Environment, EnvSpec
from .gridworld import GridWorld, build_gridworld_task
