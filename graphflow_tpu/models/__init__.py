from graphflow_tpu.models.base import GraphModel
from graphflow_tpu.models.smp2d import (
    SMP2D, SMP2DConfig, SMP_omega, SMP_beta, SMP_gamma, SMP_omega_physics,
    SMP_2D_ver6, SMP_2D_ver7, SMP_2D_ver8,
)
from graphflow_tpu.models.smp1d import (
    SMP1D, SMP1DConfig, SMP_theta, SMP_1D, SMP_1D_classification,
    Unrestricted_SMP_1D, CCN_1D,
)
from graphflow_tpu.models.gcn import (
    GCN, GCNConfig, GCN_1D, GCN_2D, GCN_3D, GCN_1D_Distance, GCN_2D_Distance,
    GCN_3D_Distance, GCN_MW, NeuralFingerprint,
)
