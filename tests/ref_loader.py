"""Load reference (torch) modules from /root/reference for parity testing.

The reference package __init__ chain pulls omegaconf/easydict (absent here),
so individual files are loaded under a synthetic package with the missing
deps stubbed. Reference code is executed, never copied.
"""

import dataclasses
import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _stub_missing_deps():
    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")
        omegaconf.MISSING = "???"

        class _OmegaConf:
            @staticmethod
            def structured(x):
                return x

            @staticmethod
            def merge(a, b):
                return b

            @staticmethod
            def create(x=None):
                return x

        omegaconf.OmegaConf = _OmegaConf
        omegaconf.DictConfig = dict
        sys.modules["omegaconf"] = omegaconf
    if "easydict" not in sys.modules:
        easydict = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                return self[k]

        easydict.EasyDict = EasyDict
        sys.modules["easydict"] = easydict


def _load(pkg_name: str, mod_name: str, path: str):
    full = f"{pkg_name}.{mod_name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def load_rqvae_modules():
    """Returns (layers, modules, quantizations) torch modules from the
    reference rqvae/models/rqvae/."""
    _stub_missing_deps()
    pkg = "ref_rqvae"
    if pkg not in sys.modules:
        p = types.ModuleType(pkg)
        p.__path__ = [f"{REF_ROOT}/rqvae/models/rqvae"]
        sys.modules[pkg] = p
    base = f"{REF_ROOT}/rqvae/models/rqvae"
    layers = _load(pkg, "layers", f"{base}/layers.py")
    modules = _load(pkg, "modules", f"{base}/modules.py")
    quantizations = _load(pkg, "quantizations", f"{base}/quantizations.py")
    return layers, modules, quantizations


def load_rqtransformer_modules():
    """Returns (configs, primitives, attentions, transformers) from the
    reference rqvae/models/rqtransformer/, with omegaconf stubbed and the
    interfaces/utils deps satisfied."""
    _stub_missing_deps()

    # transformers.py imports rqvae.utils.utils, rqvae.optimizer.loss and
    # ..interfaces. Point a synthetic 'rqvae' package at the reference tree so
    # those resolve without executing the reference package __init__ chain.
    if "rqvae" not in sys.modules:
        for name, path in [
            ("rqvae", f"{REF_ROOT}/rqvae"),
            ("rqvae.utils", f"{REF_ROOT}/rqvae/utils"),
            ("rqvae.optimizer", f"{REF_ROOT}/rqvae/optimizer"),
            ("rqvae.models", f"{REF_ROOT}/rqvae/models"),
        ]:
            m = types.ModuleType(name)
            m.__path__ = [path]
            sys.modules[name] = m
        _load("rqvae.utils", "utils", f"{REF_ROOT}/rqvae/utils/utils.py")
        _load("rqvae.optimizer", "loss", f"{REF_ROOT}/rqvae/optimizer/loss.py")
        _load("rqvae.models", "interfaces", f"{REF_ROOT}/rqvae/models/interfaces.py")

    pkg = "rqvae.models.rqtransformer"
    if pkg not in sys.modules:
        p = types.ModuleType(pkg)
        p.__path__ = [f"{REF_ROOT}/rqvae/models/rqtransformer"]
        sys.modules[pkg] = p
    base = f"{REF_ROOT}/rqvae/models/rqtransformer"
    # configs.py uses mutable dataclass defaults (illegal on Python 3.12) and
    # is only imported for type annotations — stub it.
    cfg_name = f"{pkg}.configs"
    if cfg_name not in sys.modules:
        configs = types.ModuleType(cfg_name)

        class _Cfg:  # placeholder annotation targets
            pass

        configs.AttentionBlockConfig = _Cfg
        configs.AttentionStackConfig = _Cfg
        configs.RQTransformerConfig = _Cfg
        sys.modules[cfg_name] = configs
    configs = sys.modules[cfg_name]
    primitives = _load(pkg, "primitives", f"{base}/primitives.py")
    attentions = _load(pkg, "attentions", f"{base}/attentions.py")
    transformers = _load(pkg, "transformers", f"{base}/transformers.py")
    return configs, primitives, attentions, transformers


def load_ref_inception():
    """Returns the reference rqvae/metrics/inception.py module (torch,
    pytorch-fid port). Weight download is NOT triggered at import time —
    tests must monkeypatch `fid_inception_v3` / the URL loader before
    constructing `InceptionV3` (zero-egress environment)."""
    _stub_missing_deps()
    pkg = "ref_metrics"
    if pkg not in sys.modules:
        p = types.ModuleType(pkg)
        p.__path__ = [f"{REF_ROOT}/rqvae/metrics"]
        sys.modules[pkg] = p
    return _load(pkg, "inception", f"{REF_ROOT}/rqvae/metrics/inception.py")


def load_ref_discriminator():
    """Returns the reference rqvae/losses/vqgan/discriminator.py module
    (torch-only: ActNorm + weights_init + NLayerDiscriminator)."""
    _stub_missing_deps()
    pkg = "ref_losses"
    if pkg not in sys.modules:
        p = types.ModuleType(pkg)
        p.__path__ = [f"{REF_ROOT}/rqvae/losses/vqgan"]
        sys.modules[pkg] = p
    return _load(pkg, "discriminator", f"{REF_ROOT}/rqvae/losses/vqgan/discriminator.py")


def load_ref_lpips():
    """Returns the reference rqvae/losses/vqgan/lpips.py module with its
    lpips_utils dependency stubbed (get_ckpt_path would download).
    Tests must no-op `LPIPS.load_from_pretrained` and monkeypatch
    torchvision.models.vgg16 before constructing `LPIPS`."""
    _stub_missing_deps()
    pkg = "ref_losses"
    if pkg not in sys.modules:
        p = types.ModuleType(pkg)
        p.__path__ = [f"{REF_ROOT}/rqvae/losses/vqgan"]
        sys.modules[pkg] = p
    utils_name = f"{pkg}.lpips_utils"
    if utils_name not in sys.modules:
        stub = types.ModuleType(utils_name)

        def _no_download(name, root=None, check=False):
            raise RuntimeError("zero-egress test env: weight download blocked")

        stub.get_ckpt_path = _no_download
        sys.modules[utils_name] = stub
    return _load(pkg, "lpips", f"{REF_ROOT}/rqvae/losses/vqgan/lpips.py")


class AttrDict(dict):
    """Minimal OmegaConf-like config for driving reference classes."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def copy(self):
        import copy as _copy

        return AttrDict(
            {k: (v.copy() if isinstance(v, AttrDict) else _copy.copy(v)) for k, v in self.items()}
        )
