"""Complex-at-the-boundary handling for the axon TPU backend.

The TPU runtime in this environment cannot TRANSFER complex64 between host
and device (PJRT returns UNIMPLEMENTED), and embedding device-resident
complex constants in a jit trace forces exactly such a transfer. On-device
complex arithmetic compiles fine. Policy, enforced by these helpers:

  * complex64 may appear only INSIDE a jitted computation;
  * every jit boundary value (inputs, outputs, carried state, params,
    stored constants) is float32 with a trailing re/im axis of size 2.

`pack`/`unpack` convert on device (free — a layout op fused by XLA);
`pack_tree`/`unpack_tree` handle whole state/param pytrees with a static
bool mask recording which leaves are complex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack(z):
    """complex (...,) -> float32 (..., 2). Works on jnp or np arrays."""
    if isinstance(z, np.ndarray) or np.isscalar(z):
        z = np.asarray(z)
        return np.stack([z.real.astype(np.float32),
                         z.imag.astype(np.float32)], -1)
    return jnp.stack([jnp.real(z).astype(jnp.float32),
                      jnp.imag(z).astype(jnp.float32)], -1)


def unpack(p):
    """float32 (..., 2) -> complex64 (...,)."""
    if isinstance(p, np.ndarray):
        return (p[..., 0] + 1j * p[..., 1]).astype(np.complex64)
    return jax.lax.complex(p[..., 0], p[..., 1])


def is_complex(x) -> bool:
    return jnp.iscomplexobj(x)


def pack_tree(tree):
    """Pack every complex leaf. Returns (packed_tree, mask) where mask is a
    same-structure pytree of python bools (static)."""
    leaves, treedef = jax.tree.flatten(tree)
    mask = [bool(jnp.iscomplexobj(l)) for l in leaves]
    packed = [pack(l) if m else l for l, m in zip(leaves, mask)]
    return jax.tree.unflatten(treedef, packed), \
        jax.tree.unflatten(treedef, mask)


def unpack_tree(packed, mask):
    return jax.tree.map(lambda p, m: unpack(p) if m else p, packed, mask)


def to_host(z_dev_packed) -> np.ndarray:
    """Device packed pair -> host numpy complex64 (the only legal way to
    read complex results off this TPU)."""
    return unpack(np.asarray(z_dev_packed))


def to_device(z_np):
    """Host complex -> device packed pair."""
    return jnp.asarray(pack(np.asarray(z_np)))
