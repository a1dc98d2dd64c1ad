from .base import get_model  # noqa: F401

# importing registers each model under its reference name
from . import (attention, attention_topn, e2e_model, ef_lstm,  # noqa: F401
               graph_mfn, lf_dnn, lmf, mctn, mfm, mfn, misa, mmim, mult,
               tfn)

# reference model zoo (MERBench/toolkit/models/__init__.py:18-46 + MER2024
# additions): attention, tfn, lmf, misa, mmim, mfn, graph_mfn, mfm, mctn,
# mult, ef_lstm, lf_dnn, attention_topn
