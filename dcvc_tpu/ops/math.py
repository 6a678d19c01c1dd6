"""Small differentiable math ops shared across codecs."""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x, bound: float):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound: float):
    return jnp.maximum(x, bound), x


def _lb_bwd(bound: float, x, g):
    # pass-through when above the bound OR when the gradient pushes x upward
    # (parity: LowerBound autograd op, EVC/src/models/layers.py:21-36)
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


lower_bound.defvjp(_lb_fwd, _lb_bwd)
