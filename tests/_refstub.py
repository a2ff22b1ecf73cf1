"""Stub the reference repo's I/O-only dependencies so its torch model code can
be imported as a numerical oracle without the data/env stack."""

import sys
import types


def stub_reference_deps():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    def ensure(name, **attrs):
        if name in sys.modules:
            mod = sys.modules[name]
        else:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    ensure("nibabel")
    ensure("SimpleITK")
    iopath = ensure("iopath")
    common = ensure("iopath.common")
    class _PMF:  # noqa: N801
        @staticmethod
        def get(*a, **k):
            class _PM:
                def register_handler(self, *a, **k):
                    pass
            return _PM()
    fio = ensure("iopath.common.file_io", PathManagerFactory=_PMF,
                 PathManager=object, HTTPURLHandler=object)
    iopath.common = common
    common.file_io = fio
    ensure("pytorch_msssim", ssim=None, ms_ssim=None, SSIM=object, MS_SSIM=object)
    ensure("visdom", Visdom=object)
    import datetime as _dt

    class _TZ(_dt.tzinfo):
        def utcoffset(self, dt):
            return _dt.timedelta(0)

        def dst(self, dt):
            return _dt.timedelta(0)

    ensure("pytz", timezone=lambda *a, **k: _TZ(), utc=_TZ())
    tv = ensure("torchvision")
    tv.transforms = ensure("torchvision.transforms")
    tv.utils = ensure("torchvision.utils", make_grid=None, save_image=None)
    # only stub what this env genuinely lacks — PIL and matplotlib are real
    # here, and shadowing them breaks our own plot/visualizer code
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        ensure("PIL", Image=None)
        ensure("PIL.Image")
    if importlib.util.find_spec("matplotlib") is None:
        m = ensure("matplotlib")
        m.use = lambda *a, **k: None
        ensure("matplotlib.pyplot")
    else:
        import matplotlib

        matplotlib.use("Agg")  # reference code may import pyplot at import time
