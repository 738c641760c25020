from dfmdock_tpu.features.sixd import (
    virtual_cb,
    pairwise_ca_dist,
    sixd_bins_at,
    sixd_bins_dense,
)
from dfmdock_tpu.features.positional import relpos_bin, relpos_onehot
from dfmdock_tpu.features.residues import (
    restypes,
    restypes_with_x,
    restype_order,
    restype_order_with_x,
    restype_1to3,
    restype_3to1,
    sequence_to_onehot,
)
