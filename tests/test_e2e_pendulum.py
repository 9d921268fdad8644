"""End-to-end parity gate: pendulum implicit workload.

Statistical acceptance mirroring the reference driver's printed criteria
(``python/01_pendulum/implicit/main.py:225-245``): the learned map must have
far smaller energy oscillation than the cost-matched symplectic Euler
comparator, and tiny geometric distance to the high-accuracy reference orbit.
"""

import numpy as np
import pytest

from sympgpr_tpu.systems.pendulum import PendulumConfig
from sympgpr_tpu.workloads import pendulum_implicit


@pytest.fixture(scope="module")
def result():
    return pendulum_implicit.run(PendulumConfig(nm=200))


def test_training_error_tiny(result):
    assert result["training_error"] < 1e-12


def test_energy_oscillation(result):
    eosc = np.nanmean(result["Eosc"])
    assert eosc < 1e-4  # paper-level quality (~1e-5..1e-6 typical)


def test_beats_symplectic_euler(result):
    assert np.nanmean(result["Eosc"]) < 0.1 * np.nanmean(result["Eosc_se"])


def test_geometric_distance(result):
    assert np.nanmean(result["gd"]) < 1e-8


def test_all_orbits_survive(result):
    assert np.all(np.isfinite(np.asarray(result["traj"].p)))
