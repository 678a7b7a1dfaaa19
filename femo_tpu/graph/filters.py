"""Density/field filters (pre-processor operations).

Promotes the reference's example-local GeneralFilterModel into the framework
(SURVEY.md "known defects": run_thickness_opt_cantilever_beam.py:14 imports it
from a broken path; module lives at
/root/reference/examples/beam_topo_opt/pre_processor/general_filter_model.py).

The filter is a linear "hat-kernel" smoothing over element centroids within
radius beta*h_avg: w_ij = (r - d_ij) / sum_j (r - d_ij).  Weights are built
once host-side with a cKDTree (vectorized query, unlike the reference's
per-element Python loop) and applied on device via segment-sum — the sparse
matvec is differentiable, so the filter chains into the adjoint for free.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config


class DensityFilter:
    """Linear density filter over points (element centroids).

    Parameters
    ----------
    points : (n, dim) coordinates (element centroids for DG0 design fields)
    radius : filter radius; or pass beta and h_avg (radius = beta * h_avg)
    """

    def __init__(self, points: np.ndarray, radius: float | None = None,
                 beta: float = 2.0, h_avg: float | None = None):
        from scipy.spatial import cKDTree

        points = np.asarray(points, float)
        n = len(points)
        if radius is None:
            radius = beta * float(h_avg)
        tree = cKDTree(points)
        pairs = tree.query_pairs(radius, output_type="ndarray")
        # symmetric neighbor list incl. self
        rows = np.concatenate([pairs[:, 0], pairs[:, 1], np.arange(n)])
        cols = np.concatenate([pairs[:, 1], pairs[:, 0], np.arange(n)])
        d = np.linalg.norm(points[rows] - points[cols], axis=1)
        w = radius - d
        wsum = np.bincount(rows, weights=w, minlength=n)
        w = w / wsum[rows]
        self.n = n
        self.rows = jnp.asarray(rows.astype(np.int32))
        self.cols = jnp.asarray(cols.astype(np.int32))
        self.weights = jnp.asarray(w, config.jdtype)
        self.radius = radius

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Filtered field: (W x). Differentiable device sparse matvec."""
        return jax.ops.segment_sum(
            self.weights * x[self.cols], self.rows, num_segments=self.n)

    def as_operation(self, name_in: str = "density_unfiltered",
                     name_out: str = "density"):
        """(fn, inputs, outputs) triple for Model.add_op (reference
        GeneralFilterModel parity)."""
        return (lambda x: self(x)), [name_in], [name_out]


def helmholtz_filter_radius_to_length(radius: float) -> float:
    """Standard conversion r_min -> Helmholtz length scale (for future PDE
    filter variant)."""
    return radius / (2.0 * np.sqrt(3.0))
