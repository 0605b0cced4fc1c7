"""Neural network modules for the FB framework (flax.linen).

Functionally equivalent to the reference's module zoo
(url_benchmark/agent/fb_modules.py): the string-spec ``mlp`` builder, the
two-tower Actor / ForwardMap with optional preprocess trunks, the
(sqrt(d) L2-normalized) BackwardMap, the DiagGaussianActor, the discrete
ForwardMap variant (url_benchmark/agent/discrete_fb.py:37-100) and
MultinputNet.

TPU notes:
  * all layers use orthogonal kernel init + zero bias, matching
    utils.weight_init (url_benchmark/utils.py:81-92);
  * an optional ``dtype`` (e.g. bfloat16) sets the compute dtype while
    parameters stay float32 — XLA then runs the matmuls on the MXU in bf16;
  * modules return arrays, not distribution objects, where the distribution
    needs a PRNG key — heads return (mu, std) and the caller builds a
    distribution from utils.distributions.
"""

from __future__ import annotations

import math
import typing as tp

import jax.numpy as jnp
from flax import linen as nn

Dtype = tp.Any

_ortho_init = nn.initializers.orthogonal()


def _dense(features: int, dtype: Dtype) -> nn.Dense:
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                    kernel_init=_ortho_init, bias_init=nn.initializers.zeros)


def l2_normalize(x: jnp.ndarray, scale_sqrt_dim: bool = True, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize (torch semantics: clamp-by-eps denominator), optionally
    scaled by sqrt(dim)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    y = x / jnp.maximum(norm, eps)
    if scale_sqrt_dim:
        y = math.sqrt(x.shape[axis]) * y
    return y


class MLP(nn.Module):
    """String-spec MLP: layers like (512, "ntanh", 512, "irelu", 50).

    Same mini-language as the reference's ``mlp()``
    (url_benchmark/agent/fb_modules.py:43-78): ints are Linear layers;
    "relu"/"irelu" ReLU, "ntanh" LayerNorm+Tanh, "layernorm", "tanh", and
    "L2" (sqrt(d)-scaled L2 normalization).
    """

    layers: tp.Tuple[tp.Union[int, str], ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            if isinstance(layer, str):
                if layer in ("relu", "irelu"):
                    x = nn.relu(x)
                elif layer == "ntanh":
                    x = jnp.tanh(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
                elif layer == "layernorm":
                    x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
                elif layer == "tanh":
                    x = jnp.tanh(x)
                elif layer == "L2":
                    x = l2_normalize(x)
                else:
                    raise ValueError(f"Unknown non-linearity {layer}")
            else:
                x = _dense(int(layer), self.dtype)(x)
        return x


def mlp(*layers: tp.Union[int, str], dtype: Dtype = jnp.float32) -> MLP:
    """Reference-style call sugar: mlp(10, 12, "relu", 15)."""
    return MLP(layers=tuple(layers), dtype=dtype)


class Actor(nn.Module):
    """Deterministic-mean actor; returns tanh(mu).

    Two-tower preprocess variant matches fb_modules.Actor
    (url_benchmark/agent/fb_modules.py:81-126). The TruncatedNormal
    distribution is built by the caller from (mu, std-schedule).
    """

    z_dim: int
    action_dim: int
    feature_dim: int
    hidden_dim: int
    preprocess: bool = False
    add_trunk: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        assert z.shape[-1] == self.z_dim
        d = self.dtype
        if self.preprocess:
            obs_z = mlp(self.hidden_dim, "ntanh", self.feature_dim, "irelu", dtype=d)(
                jnp.concatenate([obs, z], axis=-1))
            obs_only = mlp(self.hidden_dim, "ntanh", self.feature_dim, "irelu", dtype=d)(obs)
            h = jnp.concatenate([obs_only, obs_z], axis=-1)
            if self.add_trunk:
                h = mlp(self.hidden_dim, "irelu", dtype=d)(h)
        else:
            h = mlp(self.hidden_dim, "ntanh", self.hidden_dim, "irelu",
                    self.hidden_dim, "irelu", dtype=d)(
                jnp.concatenate([obs, z], axis=-1))
        mu = mlp(self.hidden_dim, "irelu", self.action_dim, dtype=d)(h)
        return jnp.tanh(mu)


class DiagGaussianActor(nn.Module):
    """Gaussian actor head returning (mu, std) for a SquashedNormal.

    Matches fb_modules.DiagGaussianActor (url_benchmark/agent/fb_modules.py:129-151).
    """

    z_dim: int
    action_dim: int
    hidden_dim: int
    log_std_bounds: tp.Tuple[float, float] = (-5.0, 2.0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, z: jnp.ndarray
                 ) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        assert z.shape[-1] == self.z_dim
        h = jnp.concatenate([obs, z], axis=-1)
        out = mlp(self.hidden_dim, "ntanh", self.hidden_dim, "relu",
                  2 * self.action_dim, dtype=self.dtype)(h)
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.tanh(log_std)
        lo, hi = self.log_std_bounds
        log_std = lo + 0.5 * (hi - lo) * (log_std + 1.0)
        return mu, jnp.exp(log_std)


class ForwardMap(nn.Module):
    """Twin forward maps F1, F2: (obs, z, action) -> two [B, z_dim] embeddings.

    Matches fb_modules.ForwardMap (url_benchmark/agent/fb_modules.py:154-199).
    """

    z_dim: int
    feature_dim: int
    hidden_dim: int
    preprocess: bool = False
    add_trunk: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, z: jnp.ndarray, action: jnp.ndarray
                 ) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        assert z.shape[-1] == self.z_dim
        d = self.dtype
        if self.preprocess:
            obs_action = mlp(self.hidden_dim, "ntanh", self.feature_dim, "irelu", dtype=d)(
                jnp.concatenate([obs, action], axis=-1))
            obs_z = mlp(self.hidden_dim, "ntanh", self.feature_dim, "irelu", dtype=d)(
                jnp.concatenate([obs, z], axis=-1))
            h = jnp.concatenate([obs_action, obs_z], axis=-1)
            if self.add_trunk:
                h = mlp(self.hidden_dim, "irelu", dtype=d)(h)
        else:
            h = mlp(self.hidden_dim, "ntanh", self.hidden_dim, "irelu",
                    self.hidden_dim, "irelu", dtype=d)(
                jnp.concatenate([obs, z, action], axis=-1))
        f1 = mlp(self.hidden_dim, "irelu", self.z_dim, dtype=d)(h)
        f2 = mlp(self.hidden_dim, "irelu", self.z_dim, dtype=d)(h)
        return f1, f2


class DiscreteForwardMap(nn.Module):
    """Twin forward maps for discrete actions: (obs, z) -> [B, z_dim, n_actions].

    Matches discrete_fb.ForwardMap (url_benchmark/agent/discrete_fb.py:37-100).
    """

    z_dim: int
    n_actions: int
    feature_dim: int
    hidden_dim: int
    preprocess: bool = False
    add_trunk: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, z: jnp.ndarray
                 ) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        assert z.shape[-1] == self.z_dim
        d = self.dtype
        if self.preprocess:
            obs_emb = mlp(self.hidden_dim, "ntanh", self.feature_dim, "irelu", dtype=d)(obs)
            obs_z = mlp(self.hidden_dim, "ntanh", self.feature_dim, "irelu", dtype=d)(
                jnp.concatenate([obs_emb, z], axis=-1))
            h = jnp.concatenate([obs_emb, obs_z], axis=-1)
            if self.add_trunk:
                h = mlp(self.hidden_dim, "irelu", dtype=d)(h)
        else:
            h = mlp(self.hidden_dim, "ntanh", self.hidden_dim, "irelu",
                    self.hidden_dim, "irelu", dtype=d)(
                jnp.concatenate([obs, z], axis=-1))
        f1 = mlp(self.hidden_dim, "irelu", self.z_dim * self.n_actions, dtype=d)(h)
        f2 = mlp(self.hidden_dim, "irelu", self.z_dim * self.n_actions, dtype=d)(h)
        shape = f1.shape[:-1] + (self.z_dim, self.n_actions)
        return f1.reshape(shape), f2.reshape(shape)


class BackwardMap(nn.Module):
    """Backward map B: goal -> [B, z_dim], optionally sqrt(d)-L2-normalized.

    Matches fb_modules.BackwardMap (url_benchmark/agent/fb_modules.py:211-230).
    """

    z_dim: int
    hidden_dim: int
    norm_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, goal: jnp.ndarray) -> jnp.ndarray:
        b = mlp(self.hidden_dim, "ntanh", self.hidden_dim, "relu",
                self.z_dim, dtype=self.dtype)(goal)
        if self.norm_z:
            b = l2_normalize(b)
        return b


class IdentityMap(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x


class MultinputNet(nn.Module):
    """Multiple input towers averaged then fed to an output MLP.

    Matches fb_modules.MultinputNet (url_benchmark/agent/fb_modules.py:233-250).
    """

    input_dims: tp.Tuple[int, ...]
    sequence_dims: tp.Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, *tensors: jnp.ndarray) -> jnp.ndarray:
        assert len(tensors) == len(self.input_dims)
        dim0 = self.sequence_dims[0]
        outs = [mlp(dim0, "relu", dim0, "layernorm", dtype=self.dtype)(x)
                for x in tensors]
        out = sum(outs) / len(outs)
        seq: tp.List[tp.Union[int, str]] = []
        for dim in self.sequence_dims[1:]:
            seq.extend(["relu", dim])
        if seq:
            out = mlp(*seq, dtype=self.dtype)(out)
        return out


class PixelEncoder(nn.Module):
    """4-conv pixel encoder (reference Encoder, url_benchmark/agent/
    ddpg.py:56-75): Conv 32x3x3 stride 2 + three stride-1 convs, ReLU,
    flatten. NHWC layout (TPU-native; the reference is NCHW), VALID
    padding so an 84x84 input flattens to 32*35*35 like the reference's
    ``repr_dim``. Input is raw pixels in [0, 255]; output is float32.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs.astype(self.dtype) / 255.0 - 0.5
        for stride in (2, 1, 1, 1):
            x = nn.Conv(32, (3, 3), strides=stride, padding="VALID",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=_ortho_init,
                        bias_init=nn.initializers.zeros)(x)
            x = nn.relu(x)
        return x.reshape(x.shape[:-3] + (-1,)).astype(jnp.float32)
