"""Helpers to load reference modules as CPU-runnable test oracles.

The reference tree (/root/reference) is torch+cv2 code with two obstacles for
use as an oracle on this host: hard `.cuda()` calls and a pydensecrf import
(not installed). We stub both. This file is test scaffolding only — no
reference code is copied, the originals are imported in place.
"""
import importlib.util
import os
import sys
import types

REF = "/root/reference"


def _stub_pkg_resources():
    """The reference clip package does `from pkg_resources import packaging`
    (clip/clip.py:6); setuptools' pkg_resources isn't installed here."""
    if "pkg_resources" in sys.modules:
        return
    import packaging
    import packaging.version
    mod = types.ModuleType("pkg_resources")
    mod.packaging = packaging
    sys.modules["pkg_resources"] = mod


def _stub_torchvision():
    """torchvision isn't installed; the oracle code paths we exercise only
    touch it at import time (clip/clip.py:10, utils/imutils.py:2)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "ToTensor", "Normalize", "CenterCrop"):
        setattr(transforms, name, type(name, (), {}))
    transforms.InterpolationMode = type("InterpolationMode", (),
                                        {"BICUBIC": "bicubic"})
    utils = types.ModuleType("torchvision.utils")
    tv.transforms = transforms
    tv.utils = utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.utils"] = utils


def _stub_ftfy():
    """ftfy isn't installed; the reference tokenizer (simple_tokenizer.py:6)
    only calls ftfy.fix_text, which is an identity for clean ASCII inputs —
    and the oracle paths we use never tokenize at all."""
    if "ftfy" in sys.modules:
        return
    mod = types.ModuleType("ftfy")
    mod.fix_text = lambda s: s
    sys.modules["ftfy"] = mod


def _stub_pydensecrf():
    _stub_pkg_resources()
    _stub_torchvision()
    _stub_ftfy()
    if "pydensecrf" in sys.modules:
        return
    pkg = types.ModuleType("pydensecrf")
    dense = types.ModuleType("pydensecrf.densecrf")
    util = types.ModuleType("pydensecrf.utils")
    # the CRF-oracle tests importorskip("pydensecrf.densecrf"); the marker
    # lets them tell this stub (installed for unrelated ref-module loads)
    # apart from a real install and still skip
    pkg.__excel_stub__ = dense.__excel_stub__ = util.__excel_stub__ = True
    util.unary_from_softmax = None
    util.unary_from_labels = None
    pkg.densecrf = dense
    pkg.utils = util
    sys.modules["pydensecrf"] = pkg
    sys.modules["pydensecrf.densecrf"] = dense
    sys.modules["pydensecrf.utils"] = util


def patch_cuda_to_cpu():
    """Make `.cuda()` a no-op so reference code runs on this CPU host."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor


def load_ref_module(rel_path: str, name: str):
    """Load e.g. utils/affutils.py as an importable module.

    Modules using relative imports get a synthetic parent package rooted at
    their directory; pydensecrf is stubbed first.
    """
    _stub_pydensecrf()
    patch_cuda_to_cpu()
    full = os.path.join(REF, rel_path)
    pkg_dir = os.path.dirname(full)
    pkg_name = "_ref_" + os.path.basename(pkg_dir)
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [pkg_dir]
        sys.modules[pkg_name] = pkg
    mod_name = pkg_name + "." + name
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(mod_name, full)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod
