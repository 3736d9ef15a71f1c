"""ArtifactStore: commit atomicity, versioning, crash reclamation, and
the fingerprint-keyed identity discipline."""

import json
import os

from opencypher_datalayer_spark.operators.artifacts import ArtifactStore


def _writer(payload):
    def build(d):
        with open(os.path.join(d, "data.json"), "w") as f:
            json.dump(payload, f)

    return build


def _read(vdir):
    with open(os.path.join(vdir, "data.json")) as f:
        return json.load(f)


def test_get_or_build_then_hit(tmp_path):
    store = ArtifactStore(str(tmp_path))
    key = (("corpus", 1, 2),)
    assert store.current_dir("sets", key) is None
    v1 = store.get_or_build("sets", key, _writer({"v": 1}))
    assert _read(v1) == {"v": 1}
    # a hit returns the SAME committed dir; the builder must not run
    v2 = store.get_or_build("sets", key, _writer({"v": "MUST NOT RUN"}))
    assert v2 == v1 and _read(v2) == {"v": 1}


def test_different_key_different_artifact(tmp_path):
    store = ArtifactStore(str(tmp_path))
    a = store.get_or_build("sets", (("fp", 1),), _writer({"v": "a"}))
    b = store.get_or_build("sets", (("fp", 2),), _writer({"v": "b"}))
    assert a != b and _read(a) == {"v": "a"} and _read(b) == {"v": "b"}


def test_commit_makes_new_version_and_sweep_reclaims(tmp_path):
    store = ArtifactStore(str(tmp_path))
    key = (("fp", 1),)
    v1 = store.get_or_build("ivf", key, _writer({"v": 1}))
    v2 = store.commit("ivf", key, _writer({"v": 2}))
    assert v2 != v1
    assert store.current_dir("ivf", key) == v2  # pointer swapped
    assert os.path.isdir(v1)  # old version still on disk until sweep
    removed = store.sweep(keep_versions=1)
    assert v1 in removed and not os.path.isdir(v1)
    assert _read(store.current_dir("ivf", key)) == {"v": 2}


def test_crashed_build_leaves_no_current_and_sweeps(tmp_path):
    store = ArtifactStore(str(tmp_path))
    key = (("fp", 1),)

    def boom(d):
        with open(os.path.join(d, "partial"), "w") as f:
            f.write("x")
        raise RuntimeError("crash mid-build")

    try:
        store.commit("sets", key, boom)
    except RuntimeError:
        pass
    assert store.current_dir("sets", key) is None
    # a dead-pid tmp dir (simulated crashed process) is reclaimed
    adir = store._adir("sets", key)
    dead = os.path.join(adir, "_tmp_deadbeef_p999999999")
    os.makedirs(dead)
    removed = store.sweep()
    assert dead in removed and not os.path.isdir(dead)
    # a LIVE process's tmp dir is never touched
    live = os.path.join(adir, f"_tmp_cafebabe_p{os.getpid()}")
    os.makedirs(live)
    assert live not in store.sweep() and os.path.isdir(live)


def test_drop_by_kind(tmp_path):
    store = ArtifactStore(str(tmp_path))
    store.get_or_build("sets", (("fp", 1),), _writer({"v": 1}))
    store.get_or_build("ivf", (("fp", 1),), _writer({"v": 2}))
    store.drop(kind="sets")
    assert store.current_dir("sets", (("fp", 1),)) is None
    assert store.current_dir("ivf", (("fp", 1),)) is not None
    store.drop()
    assert store.current_dir("ivf", (("fp", 1),)) is None


def test_reader_sees_only_committed_state(tmp_path):
    """A builder in progress (tmp dir exists, no rename yet) is
    invisible; after the crash-free commit the full payload appears."""
    store = ArtifactStore(str(tmp_path))
    key = (("fp", 9),)
    seen_during_build = []

    def build(d):
        seen_during_build.append(store.current_dir("sets", key))
        _writer({"v": 9})(d)

    store.commit("sets", key, build)
    assert seen_during_build == [None]
    assert _read(store.current_dir("sets", key)) == {"v": 9}
