from fpl_plus_tpu.fpl.weights import (compute_pixel_weights,
                                      write_image_weight_csv)
from fpl_plus_tpu.fpl.manifests import (create_pair_csv,
                                        create_image_label_csv,
                                        random_split_csv)

__all__ = ['compute_pixel_weights', 'write_image_weight_csv',
           'create_pair_csv', 'create_image_label_csv', 'random_split_csv']
