"""Single-program replacements for the reference's MPI utility layer.

Maps ref: src/utils/mpi.py onto the JAX execution model. The reference needs
rank-aware point evaluation (peval's try/except + Allreduce(MIN),
ref: mpi.py:22-83), broadcasts, and rank guards because dolfin shards the
mesh across processes. Here the state is a single (possibly sharded) device
array visible to the one program, so most of these are trivial — they exist
so reference-style code ports line-for-line and to document the mapping.
"""

from __future__ import annotations

import numpy as np


def get_rank() -> int:
    """(ref: mpi.py:12) — process index of a multi-host JAX runtime."""
    import jax

    return jax.process_index()


def check_process_rank() -> None:
    """Log this process's index (ref: mpi.py:17-19)."""
    import logging

    logging.getLogger(__name__).info(
        "================= Hello I am process %d", get_rank()
    )


def get_size() -> int:
    import jax

    return jax.process_count()


def mpi_broadcast(value):
    """(ref: mpi.py:86-88) — single program: the value is already global."""
    return value


def peval(flowsolver, up, point, sensor_component: int = 0) -> float:
    """Point evaluation of a mixed field (ref: mpi.py:22-37).

    The reference tries the evaluation on every rank and Allreduce(MIN)s the
    result; here the field is globally addressable — evaluate directly via
    the P2/P1 interpolation row.
    """
    from flowcontrol_tpu.fem.facets import point_probe_row

    row = point_probe_row(flowsolver.space, np.asarray(point), sensor_component)
    return float(np.asarray(up) @ row)


peval1 = peval
peval2 = peval


class MpiUtils:
    """Legacy namespace (ref: mpi.py:92-98)."""

    get_rank = staticmethod(get_rank)
    check_process_rank = staticmethod(check_process_rank)
    mpi_broadcast = staticmethod(mpi_broadcast)
    peval = staticmethod(peval)
