from fpl_plus_tpu.parallel.mesh import (make_mesh, mesh_size_from_config,
                                        replicate, shard_batch,
                                        make_sharded_train_step,
                                        sharded_sliding_window)

__all__ = ['make_mesh', 'mesh_size_from_config', 'replicate', 'shard_batch',
           'make_sharded_train_step', 'sharded_sliding_window']
