def __getattr__(name):
    if name == "DRTMD":
        from .drtmd import DRTMD
        return DRTMD
    import importlib
    if name in ("drtmd", "resolve", "ndx", "nddata", "surface", "path", "flow",
                "segmentation", "extrema", "curvature", "sheet", "tda", "gp"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
