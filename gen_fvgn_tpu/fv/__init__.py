from gen_fvgn_tpu.fv.integrator import integrate_residuals, FVLosses

__all__ = ["integrate_residuals", "FVLosses"]
