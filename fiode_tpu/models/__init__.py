from .backbones import KWLargeBackbone, PlainCNNBackbone, TinyMLPBackbone, make_backbone
from .dynamics import SimplexDynamics, barrier_bounds, densify_dynamics_params
from .ivp import NeuralODEClassifier
from .layers import CayleyConv, CayleyLinear, GroupSort, LipsConv, LipsLinear, Normalize
from .legacy_dynamics import ConvBlockDynamics, DynBasicBlock, DynBottleneck, ResNetOutput
