from gen_fvgn_tpu.io.vtu import write_vtu_2d, write_vtp_polyline, write_point_cloud_vtu
from gen_fvgn_tpu.io.tecplot import write_tecplot_zone
from gen_fvgn_tpu.io.logger import RunLogger
from gen_fvgn_tpu.io import checkpoint

__all__ = ["write_vtu_2d", "write_vtp_polyline", "write_point_cloud_vtu",
           "write_tecplot_zone", "RunLogger", "checkpoint"]
