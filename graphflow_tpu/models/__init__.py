from graphflow_tpu.models.base import GraphModel
from graphflow_tpu.models.smp2d import (
    SMP2D, SMP2DConfig, SMP_omega, SMP_beta, SMP_gamma, SMP_omega_physics,
    SMP_2D_ver6, SMP_2D_ver7, SMP_2D_ver8,
)
from graphflow_tpu.models.smp1d import (
    SMP1D, SMP1DConfig, SMP_theta, SMP_1D, SMP_1D_classification,
    Unrestricted_SMP_1D,
)
from graphflow_tpu.models.gcn import (
    GCN, GCNConfig, GCN_1D, GCN_2D, GCN_3D, GCN_1D_Distance, GCN_2D_Distance,
    GCN_3D_Distance, GCN_MW, NeuralFingerprint,
)
from graphflow_tpu.models.pairgraphs import (
    SMPPairGraphs, SMP_omega_pairgraphs, SMP_beta_pairgraphs,
    SMP_gamma_pairgraphs, SMP_sigma_pairgraphs, SMP_theta_pairgraphs,
    CCN_1D, GCNKernel, GCN_1D_Kernel, GCN_2D_Kernel, GCN_3D_Kernel,
)
from graphflow_tpu.models.gru_gcn import (
    GRU_GCN, GRU_GCN_1D, GRU_GCN_2D, GRU_GCN_3D,
)
from graphflow_tpu.models.gca import GCA_1D, CGCN, CGCN_1D, CGCN_2D
from graphflow_tpu.models.lcnn import LCNN
from graphflow_tpu.models.rnn import LSTM, GRU
from graphflow_tpu.models.mlp import MLP, CNN
from graphflow_tpu.models.smp2d_steerable import (
    SMP2DSteerable, SMP2DSteerableConfig, SMP_2D, SMP_2D_classification,
    SMP_2D_ver2, SMP_2D_ver3, SMP_2D_ver4, SMP_2D_ver4_classification,
    SMP_2D_ver5, Unrestricted_SMP_2D, Unrestricted_SMP_2D_ver2,
)
from graphflow_tpu.models.smp2d import (
    SMP_beta_physics, SMP_gamma_physics, SMP_2D_ver6_classification,
    SMP_2D_ver7_classification, SMP_2D_ver8_thread,
)
from graphflow_tpu.models.smp1d import (
    SMP_theta_physics, SMP_1D_ver2, SMP_1D_ver3, SMP_1D_ver3_classification,
    Unrestricted_SMP_1D_ver2,
)
from graphflow_tpu.models.smp2d import smp2d_inspect
from graphflow_tpu.models.smp2d import (
    SMP_omega_gpu, SMP_beta_gpu,
    SMP_omega_gpu_multistreams, SMP_beta_gpu_multistreams,
)
