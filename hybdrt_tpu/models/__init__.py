def __getattr__(name):
    if name == "DRT":
        from .drt import DRT
        return DRT
    if name == "DiscreteElementModel":
        from .elements import DiscreteElementModel
        return DiscreteElementModel
    if name == "NonlinearDRT":
        from .nonlin import NonlinearDRT
        return NonlinearDRT
    if name == "DCT":
        from .dct import DCT
        return DCT
    import importlib
    if name in ("drt", "elements", "nonlin", "dct", "kk", "pfrt", "background",
                "sequential"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
