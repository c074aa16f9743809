from fpl_plus_tpu.ops.pallas_fused import dsbn_prelu, dsbn_prelu_reference

__all__ = ['dsbn_prelu', 'dsbn_prelu_reference']
