def __getattr__(name):
    if name == "DRT":
        from .drt import DRT
        return DRT
    if name == "DiscreteElementModel":
        from .elements import DiscreteElementModel
        return DiscreteElementModel
    raise AttributeError(name)
