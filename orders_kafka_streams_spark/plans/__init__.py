from .observe import peek, PeekListener
from .explain import explain_str, exchanges_in, pushed_filters

__all__ = ["peek", "PeekListener", "explain_str", "exchanges_in", "pushed_filters"]
