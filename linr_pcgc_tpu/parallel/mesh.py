"""Device-mesh construction for frame-parallel overfitting.

The reference has no parallelism at all (single process, single GPU;
SURVEY.md section 2.4).  This framework introduces two levels:

  * within a GOP: frames are data-parallel across chips on a 1-D ``dp``
    mesh axis; gradient reduction is a ``psum`` that XLA lays onto ICI;
  * across GOPs/sequences: independent overfit jobs (embarrassingly
    parallel over hosts/DCN — no cross-host collectives needed), driven by
    launching one process per sequence.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def make_mesh_gop_sp(gop_lanes: int, sp: int) -> Mesh:
    """2-D (gop x sp) mesh for the combined trainer
    (parallel/gop_parallel.make_epoch_fn_gop_sp).  The sp axis is the
    minor (fastest-varying) one so each GOP's stage-psum rides adjacent
    ICI links."""
    import numpy as np

    n = gop_lanes * sp
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"requested {gop_lanes}x{sp}={n} devices, only "
            f"{len(devices)} available"
        )
    return Mesh(
        np.array(devices[:n]).reshape(gop_lanes, sp), ("gop", "sp")
    )
