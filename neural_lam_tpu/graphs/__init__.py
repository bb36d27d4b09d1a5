"""Graph construction, storage and loading.

TPU-native re-design of the reference graph pipeline
(reference: neural_lam/create_graph.py, neural_lam/utils.py:259-535):
same geometry (factor-3 mesh coarsening, diagonal edges, 0.67*dm-radius
g2m, 4-NN m2g, 1-NN hierarchical up/down), stored as ``.npz`` arrays with a
``metainfo.yaml`` spec version instead of pickled torch tensors.
"""

from .build import create_graph, create_graph_from_datastore  # noqa: F401
from .load import load_graph  # noqa: F401
