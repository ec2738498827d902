"""Multi-host decode scale-out: jax.distributed + DCN ref-plane exchange.

The reference scales within one process via its worker pool
(src/thread_task.c:550 task loop; frame contexts src/lib.c:111-123) and
has no cross-machine story.  The TPU-native redesign (SURVEY §5.8):

* processes form ONE global mesh with a 'host' axis (DCN) and a 'dev'
  axis (ICI): ``init_multihost`` + ``global_mesh``;
* GOP-level frame parallelism (``plan_gop_levels``, the static form of
  dav1d's row-progress gating) assigns the independent frames of each
  level round-robin to hosts: ``assign_level_frames``;
* after a host finishes a frame, its reference planes reach every other
  host as ONE collective over the 'host' axis — broadcast-from-owner
  expressed as a masked psum (``broadcast_ref_plane``) so XLA lowers it
  onto the DCN all-reduce ring, not host-mediated gathers;
* within a host, pixel work shards over 'dev' exactly as single-host
  (parallel/filter_shard, parallel/tile_decode).

CI drives the real thing: tests/test_multihost.py spawns two OS
processes, each holding 4 virtual CPU devices, connected through
jax.distributed's coordination service with gloo collectives, and
checks the exchange bit-exact.  On TPU pods the same code runs over
ICI/DCN unchanged — only the coordinator address and device counts
change.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def init_multihost(coordinator: str, num_processes: int,
                   process_id: int, cpu_collectives: str = "gloo"):
    """Join the global decode cluster.  On CPU test rigs selects gloo
    collectives; on TPU pods jax.distributed discovers the topology and
    this reduces to the standard initialize call."""
    # NB: must not touch the XLA backend before initialize() (even
    # jax.devices()/default_backend() would pin it) — inspect the
    # requested platform from config/env only.
    platforms = (jax.config.jax_platforms or
                 __import__("os").environ.get("JAX_PLATFORMS", ""))
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(n_hosts: int, devs_per_host: int) -> Mesh:
    """('host', 'dev') mesh over all processes' devices. jax.devices()
    enumerates globally (process 0's devices first)."""
    devs = np.asarray(jax.devices()[:n_hosts * devs_per_host])
    return Mesh(devs.reshape(n_hosts, devs_per_host), ("host", "dev"))


def assign_level_frames(levels, n_hosts: int):
    """Round-robin the independent frames of each GOP level across
    hosts.  Returns [{host: [frame_idx, ...]} per level]."""
    out = []
    for lvl in levels:
        a = {h: [] for h in range(n_hosts)}
        for j, fi in enumerate(lvl):
            a[j % n_hosts].append(fi)
        out.append(a)
    return out


def host_local_array(mesh: Mesh, plane: np.ndarray | None,
                     shape, dtype=np.int32):
    """Wrap this process's decoded plane (or zeros if it is not the
    owner) as a global array sharded over 'host' with rows replicated
    over 'dev'.  Every host contributes a (1, H, W) slice."""
    local = (np.zeros((1,) + tuple(shape), dtype) if plane is None
             else np.ascontiguousarray(plane[None]).astype(dtype))
    sharding = NamedSharding(mesh, P("host", None, None))
    return jax.make_array_from_process_local_data(sharding, local)


def broadcast_ref_plane(mesh: Mesh, stacked, owner_host: int):
    """One DCN collective: every host receives owner_host's plane.

    stacked: global (n_hosts, H, W) array sharded over 'host' (from
    host_local_array).  The owner's slice is selected by a mask and
    psum'd over 'host' — XLA lowers this to an all-reduce over the DCN
    axis; non-owner contributions are zero."""
    def body(x):
        h = jax.lax.axis_index("host")
        keep = (h == owner_host).astype(x.dtype)
        return jax.lax.psum(x * keep, "host")[0]     # drop the host row

    f = shard_map(body, mesh=mesh,
                  in_specs=P("host", None, None),
                  out_specs=P())
    return jax.jit(f)(stacked)


def exchange_level_refs(mesh: Mesh, my_host: int, produced: dict,
                        shape, dtype=np.int32):
    """After a GOP level completes: exchange every produced reference
    plane (slot -> plane on its owner host, None elsewhere) so all hosts
    enter the next level with identical reference state.  Returns
    {slot: np plane} replicated on every host.

    produced: {slot: (owner_host, plane_or_None)} — plane is not None
    exactly on the owner.  Slots exchange in sorted order so every
    process issues the same collective sequence (SPMD requirement)."""
    out = {}
    for slot in sorted(produced):
        owner, plane = produced[slot]
        stacked = host_local_array(
            mesh, plane if my_host == owner else None, shape, dtype)
        out[slot] = np.asarray(
            jax.device_get(broadcast_ref_plane(mesh, stacked, owner)))
    return out
