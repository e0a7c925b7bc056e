from gen_fvgn_tpu.native.lib import (available, khop_pairs, segment_plan,
                                     gather_table, ccw_sort_cells)

__all__ = ["available", "khop_pairs", "segment_plan", "gather_table",
           "ccw_sort_cells"]
