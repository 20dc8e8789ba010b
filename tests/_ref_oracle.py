"""Shared machinery for loading REFERENCE modules as differential
oracles (used by test_reference_differential_ext.py and
test_reference_differential_garden.py).

The reference tree at /root/reference is read-only public content; these
helpers import its modules with heavyweight externals stubbed (chromadb
and HF checkpoints aren't available in this image) and restore
sys.modules/sys.path/env afterwards so the oracles never leak into other
tests.
"""

import contextlib
import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference/nba_proj"


class AnyStub:
    """Absorbs any call / attribute / index — a sink for stubbed APIs the
    functions under test never exercise (a meaningful use would still
    fail loudly downstream when the stub's output hits real math)."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return AnyStub()

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return AnyStub()

    def __getitem__(self, key):
        return AnyStub()

    def __iter__(self):
        # Refuse, loudly: silently iterating zero times would let a
        # differential pass vacuously on an oracle that never saw data.
        raise TypeError("attempted to iterate an AnyStub — the reference "
                        "path under test reached a stubbed API")


class StubHF:
    """transformers.ViTModel / ViTImageProcessor shim: the reference
    instantiates these at module scope (zero egress here)."""

    @classmethod
    def from_pretrained(cls, *a, **k):
        return cls()

    def to(self, *a, **k):
        return self

    def eval(self):
        return self

    def __call__(self, *a, **k):
        return AnyStub()


def permissive_module(name):
    m = types.ModuleType(name)

    def getattr_(attr):
        # Refuse dunders: inspect.getmodule probes every sys.modules
        # entry's __file__ during tracebacks/registrations and chokes
        # on an AnyStub path.
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)
        return AnyStub()

    m.__getattr__ = getattr_  # PEP 562
    m.__path__ = []
    return m


def stub_set(*groups):
    """Build {module_name: stub_module} for the requested groups."""
    stubs = {}

    def add(name):
        stubs[name] = permissive_module(name)
        return stubs[name]

    if "chroma" in groups:
        m = add("chromadb")

        class _StubClient:
            def __init__(self, *a, **k):
                pass

            def get_or_create_collection(self, *a, **k):
                return AnyStub()

        m.PersistentClient = _StubClient
    if "hf" in groups:
        m = add("transformers")
        m.ViTModel = StubHF
        m.ViTImageProcessor = StubHF
    if "official" in groups:
        # Permissive no-op stubs: enough to IMPORT modules that never
        # call into `official`. For differentials that must RUN
        # nn_blocks models, use "garden" instead (faithful stand-ins).
        for name in (
                "official", "official.modeling", "official.vision",
                "official.vision.modeling",
                "official.vision.modeling.layers",
                "official.vision.modeling.layers.nn_blocks",
                "official.vision.modeling.layers.nn_layers",
                "official.vision.modeling.backbones",
                "official.vision.modeling.backbones.vit",
                "official.vision.modeling.backbones.vit_specs",
                "official.vision.modeling.backbones.factory"):
            add(name)
    if "garden" in groups:
        from _tf_garden import garden_modules
        stubs.update(garden_modules())
    if "tf" in groups:
        # Only for truncated script loads whose helpers are pure numpy:
        # shadow the real TF so `load_model(...)` / `model.predict`
        # preludes become no-ops. Restored right after the load.
        for name in ("tensorflow", "tensorflow.keras",
                     "tensorflow.keras.models", "tensorflow.keras.layers",
                     "tf_keras"):
            add(name)
    if "joblib" in groups:
        add("joblib")
    if "skvideo" in groups:
        # Not installed in this image; the embedding-writer scripts import
        # skvideo.io at module scope but never use it.
        add("skvideo")
        add("skvideo.io")
    if "dbm" in groups:
        # db_maintainence modules load trained .h5 projector weights at
        # module scope; the training modules only take ``rebuild_db``
        # from them, which these tests never call.
        for name in ("db_maintainence", "db_maintainence.db_rebuild",
                     "db_maintainence.db_rebuild_chunk",
                     "db_maintainence.db_rebuild_ratt",
                     "db_maintainence.build_embeddings_store"):
            add(name)
    if "reranker" in groups:
        # The reference imports models.candidate_reranker — a module that
        # does not exist in its own tree (SURVEY §2.1); stub it exactly
        # as a rebuild must to make training_stage2 importable.
        m = add("models.candidate_reranker")
        m.CandidateReranker = AnyStub
    return stubs


def is_ref_module(mod):
    f = getattr(mod, "__file__", None) or ""
    if f.startswith("/root/reference"):
        return True
    try:
        # torch.classes' __path__ is a non-iterable _ClassNamespace
        paths = list(getattr(mod, "__path__", []) or [])
    except TypeError:
        paths = []
    for p in paths:
        if str(p).startswith("/root/reference"):
            return True
    return False


@contextlib.contextmanager
def ref_import_env(stubs):
    """Stub modules + REF_ROOT on sys.path; on exit restore sys.modules
    (drop stubs and reference-tree modules, keep real libraries that got
    imported along the way — re-importing tensorflow per fixture would
    cost ~40 s each), sys.path, the env vars the scripts set, and the
    global RNG state they clobber (random.seed / np.random.seed at
    module scope, e.g. test/get_clip_sequences.py:37-51) plus TF op
    determinism if a script enabled it. TF's global seed itself has no
    getter; scripts that set it only affect tests that rely on
    UNSEEDED tf randomness, which none here do."""
    import random

    import numpy as np

    saved_modules = dict(sys.modules)
    saved_path = list(sys.path)
    env_keys = ("CUDA_VISIBLE_DEVICES", "PYTHONHASHSEED")
    saved_env = {k: os.environ.get(k) for k in env_keys}
    saved_py_rng = random.getstate()
    saved_np_rng = np.random.get_state()
    prev_bc = sys.dont_write_bytecode
    sys.dont_write_bytecode = True
    stub_ids = {id(m) for m in stubs.values()}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_ROOT)
    try:
        yield
    finally:
        sys.dont_write_bytecode = prev_bc
        sys.path[:] = saved_path
        for name in list(sys.modules):
            mod = sys.modules[name]
            if name in saved_modules:
                if mod is not saved_modules[name]:
                    sys.modules[name] = saved_modules[name]
            elif id(mod) in stub_ids or is_ref_module(mod):
                del sys.modules[name]
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        random.setstate(saved_py_rng)
        np.random.set_state(saved_np_rng)
        tf = sys.modules.get("tensorflow")
        if tf is not None:
            # a reference module may enable_op_determinism at import
            # (training_stage2.py:51-62); don't leak it into the suite
            try:
                tf.config.experimental.disable_op_determinism()
            except Exception:
                pass


def load_module(name, filename, stubs):
    with ref_import_env(stubs):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_ROOT, filename))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        try:
            spec.loader.exec_module(mod)
        finally:
            sys.modules.pop(name, None)
    return mod


def load_truncated(name, filename, cut_prefix, stubs, cwd=None):
    """Exec a reference script only UP TO its first pipeline statement
    (the line starting with ``cut_prefix``), yielding the pure helpers
    defined above the cut."""
    path = os.path.join(REF_ROOT, filename)
    with open(path) as f:
        lines = f.read().splitlines(keepends=True)
    cut = next((i for i, l in enumerate(lines)
                if l.startswith(cut_prefix)), None)
    if cut is None:
        raise ValueError(
            f"cut_prefix {cut_prefix!r} matches no line of {path} — "
            "the pinned reference file drifted or the prefix is wrong")
    code = compile("".join(lines[:cut]), path, "exec")
    mod = types.ModuleType(name)
    mod.__file__ = path
    with ref_import_env(stubs):
        old_cwd = os.getcwd()
        if cwd is not None:
            os.chdir(cwd)
        try:
            exec(code, mod.__dict__)
        finally:
            os.chdir(old_cwd)
    return mod
