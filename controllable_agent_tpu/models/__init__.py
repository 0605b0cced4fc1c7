from .networks import (
    MLP,
    mlp,
    Actor,
    DiagGaussianActor,
    ForwardMap,
    DiscreteForwardMap,
    BackwardMap,
    IdentityMap,
    MultinputNet,
)
