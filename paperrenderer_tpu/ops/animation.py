"""Animation: per-vertex displacement and device-side instance animation.

Reference parity:
  * ``BasicAnimation.comp`` (example, 56 LoC): per-vertex sine displacement
    from a parent VBO into an instance's unique VBO, followed by a BLAS
    rebuild (main.cpp:908-921). Here ``animate_vertices`` is the same math as
    one fused op over a vertex range; the "BLAS rebuild" is the world-BVH
    rebuild that happens anyway inside the RT frame.
  * the example's raindrop spawner (main.cpp:780-833) animates instance
    transforms on the host; at 100k instances host-side python is the
    bottleneck, so ``animate_instances`` moves the whole transform update
    on-device: one fused op over the instance SoA per frame, zero host
    traffic. This is the TPU answer to "GPU-driven = no CPU per-instance
    cost" (docs.html:29-31).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.scene import InstanceArrays


def animate_vertices(
    positions: jax.Array,   # f32[V, 3] rest positions (the "parent VBO")
    time: jax.Array,        # f32[]
    *,
    amplitude: float = 0.1,
    frequency: float = 4.0,
) -> jax.Array:
    """Sine displacement along z by xy-phase — the BasicAnimation.comp math
    shape (per-vertex procedural wobble). Returns displaced positions."""
    phase = positions[..., 0] + positions[..., 1]
    dz = amplitude * jnp.sin(frequency * phase + time)
    return positions.at[..., 2].add(dz)


def animate_instances(
    instances: InstanceArrays,
    time: jax.Array,         # f32[]
    *,
    orbit_radius: float = 0.5,
    spin_rate: float = 1.0,
    bob_rate: float = 2.0,
) -> InstanceArrays:
    """Procedurally animate every live instance on-device: orbit jitter on
    position, spin on rotation. One fused VPU pass over the SoA; the host
    never touches per-instance data (the dynamic-100k path of BASELINE
    config 5)."""
    n = instances.capacity
    idx = jnp.arange(n, dtype=jnp.float32)
    alive = instances.alive

    phase = idx * 0.618034 * 2.0 * jnp.pi  # golden-ratio decorrelation
    bob = jnp.sin(bob_rate * time + phase) * orbit_radius
    new_pos = instances.pos.at[:, 2].add(jnp.where(alive, bob, 0.0))

    # incremental spin about z: q' = dq * q
    half = 0.5 * spin_rate * time + phase * 0.0
    dq = jnp.stack(
        [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)],
        axis=0,
    )  # broadcast same spin to all (scalar half) — shape [4]
    w, x, y, z = instances.quat[:, 0], instances.quat[:, 1], instances.quat[:, 2], instances.quat[:, 3]
    dw, dz = dq[0], dq[3]
    new_quat = jnp.stack(
        [
            dw * w - dz * z,
            dw * x - dz * y,
            dw * y + dz * x,
            dw * z + dz * w,
        ],
        axis=-1,
    )
    new_quat = jnp.where(alive[:, None], new_quat, instances.quat)

    return InstanceArrays(
        pos=new_pos,
        scale=instances.scale,
        quat=new_quat,
        model_id=instances.model_id,
    )
