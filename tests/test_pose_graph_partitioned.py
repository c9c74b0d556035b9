"""Partitioned (Schur-complement, psum) pose-graph solve vs the dense one.

Runs on the 8-virtual-device CPU mesh (conftest).  The partitioned solver is
exact block elimination of the same damped system, so optimized poses must
match the dense back-end to solver precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dicp_tpu import se3
from dicp_tpu.odometry import PoseGraph, pose_graph_optimize
from dicp_tpu.parallel import make_mesh
from dicp_tpu.parallel.pose_graph import (partition_graph,
                                          pose_graph_optimize_partitioned)


def _chain_graph(V, rng, loop_closures=()):
    """Noisy odometry chain + loop closures with exact measurements."""
    xi_steps = rng.normal(scale=0.1, size=(V - 1, 6))
    poses_true = [np.eye(4)]
    for k in range(V - 1):
        poses_true.append(poses_true[-1] @ np.asarray(se3.vec2tran(jnp.asarray(xi_steps[k]))))
    poses_true = jnp.asarray(np.stack(poses_true))

    edges_i = list(range(V - 1))
    edges_j = list(range(1, V))
    t_meas = [np.asarray(se3.tran_inv(poses_true[i]) @ poses_true[j])
              for i, j in zip(edges_i, edges_j)]
    for i, j in loop_closures:
        edges_i.append(i)
        edges_j.append(j)
        t_meas.append(np.asarray(se3.tran_inv(poses_true[i]) @ poses_true[j]))

    graph = PoseGraph(jnp.asarray(edges_i, jnp.int32), jnp.asarray(edges_j, jnp.int32),
                      jnp.asarray(np.stack(t_meas)), jnp.ones((len(edges_i),)))

    # perturb the initial guess (keep pose 0 at the gauge)
    noise = rng.normal(scale=0.05, size=(V, 6))
    noise[0] = 0.0
    poses_init = poses_true @ jax.vmap(se3.vec2tran)(jnp.asarray(noise))
    return poses_true, poses_init, graph


@pytest.mark.parametrize("n_parts", [2, 4])
def test_partitioned_matches_dense(n_parts):
    rng = np.random.default_rng(0)
    V = 16
    poses_true, poses_init, graph = _chain_graph(V, rng, loop_closures=[(2, 13)])

    dense, _ = pose_graph_optimize(poses_init, graph, iterations=8)

    mesh = make_mesh((len(jax.devices()) // n_parts, n_parts))
    part = pose_graph_optimize_partitioned(poses_init, graph, mesh, iterations=8)

    np.testing.assert_allclose(np.asarray(part), np.asarray(dense), atol=1e-6)
    # and both recover the ground truth on exact measurements
    err = np.max(np.abs(np.asarray(part) - np.asarray(poses_true)))
    assert err < 1e-5, f"pose error {err}"


def test_partition_structure():
    """Separators = endpoints of cross-partition edges; interiors disjoint."""
    V = 12
    edges_i = np.array([*range(V - 1), 1])
    edges_j = np.array([*range(1, V), 10])
    part = partition_graph(V, edges_i, edges_j, 4)

    ints = part.int_ids[part.int_ids >= 0]
    assert len(set(ints.tolist())) == len(ints), "interior owned twice"
    assert set(ints.tolist()).isdisjoint(set(part.sep_ids.tolist()))
    # chain boundaries at 2|3, 5|6, 8|9 plus loop closure 1-10
    for v in (1, 10):
        assert v in part.sep_ids.tolist()
    # every edge appears exactly once
    assert int(part.e_valid.sum()) == len(edges_i)


def test_partitioned_no_loop_closures():
    """Pure chain: separators are just the partition boundary poses."""
    rng = np.random.default_rng(1)
    V = 9
    _, poses_init, graph = _chain_graph(V, rng)
    dense, _ = pose_graph_optimize(poses_init, graph, iterations=6)
    mesh = make_mesh((2, 4))
    part = pose_graph_optimize_partitioned(poses_init, graph, mesh, iterations=6)
    np.testing.assert_allclose(np.asarray(part), np.asarray(dense), atol=1e-6)
