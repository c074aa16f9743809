from fpl_plus_tpu.metrics.seg_metrics import (binary_assd, binary_dice,
                                              binary_hd95, binary_iou,
                                              binary_relative_volume_error,
                                              get_binary_evaluation_score,
                                              get_multi_class_evaluation_score)
from fpl_plus_tpu.metrics.evaluate import eva_main

__all__ = ['binary_dice', 'binary_iou', 'binary_assd', 'binary_hd95',
           'binary_relative_volume_error', 'get_binary_evaluation_score',
           'get_multi_class_evaluation_score', 'eva_main']
