"""sympgpr_tpu — TPU-native symplectic Gaussian-process regression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
redmod-team/SympGPR: learn the generating function of a symplectic map from
derivative observations with a GP, then iterate the learned map to reproduce
long-time Hamiltonian dynamics (pendulum, perturbed pendulum, Henon-Heiles,
Chirikov standard map, tokamak field lines).
"""

from sympgpr_tpu.kernels import (
    PER_SE,
    PER_SE_FREQ,
    SE_SE,
    SUM_PER_SE,
    Kernel,
    get_kernel,
)
from sympgpr_tpu.gp.covariance import build_K, build_Kreg, pack_points
from sympgpr_tpu.gp.likelihood import nll, nll_reg
from sympgpr_tpu.gp.model import AuxGP, SympGP, load_models, save_models
from sympgpr_tpu.gp.train import (
    fit_auxgp,
    fit_sympgp,
    fit_sympgp_ondevice,
    fit_sympgp_separable,
    minimize_cmaes,
    minimize_lbfgs,
)
from sympgpr_tpu.maps.symplectic import (
    MapConfig,
    Trajectory,
    apply_map,
    apply_map_split,
    calc_P,
    calc_Q,
    stack_models,
)
from sympgpr_tpu.maps.fast_apply import apply_map_fast
from sympgpr_tpu.gp.predict import predict_aux, predict_df
from sympgpr_tpu.gp.hmc import sample_hmc, sample_hmc_sharded

__version__ = "0.1.0"
