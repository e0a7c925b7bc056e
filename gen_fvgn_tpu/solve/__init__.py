from gen_fvgn_tpu.solve.rollout import rollout
from gen_fvgn_tpu.solve.instance_opt import solve_adam, solve_lbfgs

__all__ = ["rollout", "solve_adam", "solve_lbfgs"]
