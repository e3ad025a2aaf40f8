import numpy as np

from ppr_tpu.harness import PerfHarness, TestType, SWEEPS
from ppr_tpu.models import AlgoType


def test_perf_test_whole_graph(got, tmp_path):
    h = PerfHarness(got, seed=0, out_dir=str(tmp_path), progress=False)
    res = h.algo_perf_test(
        AlgoType.FWDPUSH, 5, -1, 1e-6, -1.0, False, TestType.WHOLE_GRAPH
    )
    assert res.avg_max_err is not None and res.avg_max_err < 1e-3
    assert res.avg_ms > 0
    report = (tmp_path / f"{got.name}_AlgoPerfResults.txt").read_text()
    assert "1e-06" in report or "1e-06" in report.replace("E", "e")


def test_perf_test_topk(got, tmp_path):
    h = PerfHarness(got, seed=1, out_dir=str(tmp_path), progress=False)
    res = h.algo_perf_test(
        AlgoType.FORA_TOPK, 5, 10, 0.5, -1.0, False, TestType.TOPK
    )
    assert res.avg_precision > 0.85
    assert res.avg_ndcg > 0.95


def test_perf_test_preprocessed(got, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    h = PerfHarness(got, seed=2, out_dir=str(tmp_path), progress=False)
    res = h.algo_perf_test(
        AlgoType.MC, 4, -1, 1.0, -1.0, True, TestType.WHOLE_GRAPH
    )
    assert res.prep_ms is not None and res.prep_bytes > 0
    assert res.avg_max_err < 0.2


def test_query_nodes_seeded(got):
    a = PerfHarness(got, seed=7).get_query_nodes(20)
    b = PerfHarness(got, seed=7).get_query_nodes(20)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < got.n


def test_sweep_specs_cover_all_datasets():
    assert set(SWEEPS) == {"got", "blogcatalog", "flickr", "grqc", "amazon"}
    got = SWEEPS["got"]
    # 5 algorithms per GOT test, 5 params each (Gen_Util.java:451-478)
    assert len(got["whole_graph"]) == 5
    assert all(len(v) == 5 for v in got["whole_graph"].values())


def test_cli_smoke(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from ppr_tpu.cli import load_dataset, build_parser

    ds = load_dataset("synth:300x4@1")
    assert ds.graph.n == 300
    args = build_parser().parse_args(["--query", "3", "--k", "5"])
    assert args.alpha == 0.15 and args.eps == 0.5


def test_batch_test_skips_undefined_prep(tmp_path, monkeypatch):
    """A sweep spec without a preprocessing section must get an explicit
    skip note for Test 3, never a silent whole-graph fallback (all five
    built-in specs now carry the reference's prep arrays; this guards
    custom/partial specs)."""
    monkeypatch.chdir(tmp_path)
    from ppr_tpu.cli import load_dataset

    ds = load_dataset("synth:200x4@2")
    monkeypatch.setitem(
        SWEEPS, "noprep",
        {"whole_graph": SWEEPS["got"]["whole_graph"],
         "topk": SWEEPS["got"]["topk"]},
    )
    h = PerfHarness(ds, seed=0, out_dir=str(tmp_path), progress=False)
    h.algo_perf_batch_test(query_num=2, k=5, sweep="noprep", tests=(3,),
                           budget_s=1.0)
    report = (tmp_path / f"{ds.name}_AlgoPerfResults.txt").read_text()
    assert "Test 3 skipped: no preprocessing sweep" in report
    assert "Test 3. Preprocessing test" not in report


def test_sweep_specs_have_reference_prep_arrays():
    """Every built-in dataset spec carries the reference's preprocessing
    arrays (Gen_Util.java:355-362, :377-382, :412-419, :441-448); amazon's
    BASE prep array is empty in the reference and stays empty here."""
    for name in SWEEPS:
        assert "prep" in SWEEPS[name], name
    assert SWEEPS["amazon"]["prep"][AlgoType.BASE_WHOLE_GRAPH] == []
    assert len(SWEEPS["flickr"]["prep"][AlgoType.BASE_WHOLE_GRAPH]) == 10


def test_preprocessing_device_path_matches_host_select(got, tmp_path,
                                                       monkeypatch):
    """The device-compaction store rows equal a host-side threshold of the
    dense whole-graph batch (ForwardPush as the probe algorithm)."""
    monkeypatch.chdir(tmp_path)
    from ppr_tpu.models.forward_push import ForwardPush

    algo = ForwardPush(got, 0.15, seed=1)
    assert hasattr(algo, "compute_whole_graph_device")
    algo.preprocessing(-1.0, 1e-4, progress=False)
    dense = algo.compute_whole_graph_batch(np.arange(got.graph.n), 1e-4)
    for s in (0, 7, 50, got.graph.n - 1):
        row = algo._store.read_row(s)
        want = dense[s][: got.graph.n_pad]
        keep = want > 0.0
        np.testing.assert_allclose(row[keep], want[keep])
        assert (row[~keep] == 0).all()


def test_batch_test_algos_filter(tmp_path, monkeypatch):
    """--algos restricts each test to the named algorithms but keeps the
    reference's section numbering (resume a budget-cut sweep without
    repaying completed sections)."""
    monkeypatch.chdir(tmp_path)
    from ppr_tpu.cli import load_dataset

    ds = load_dataset("synth:200x4@3")
    h = PerfHarness(ds, seed=0, out_dir=str(tmp_path), progress=False)
    h.algo_perf_batch_test(query_num=2, k=5, sweep="got", tests=(2,),
                           budget_s=1.0, algos={"MC"})
    report = (tmp_path / f"{ds.name}_AlgoPerfResults.txt").read_text()
    # MC is 2.3 in the got topk spec — numbering preserved, others absent
    assert "2.3 MC" in report
    assert "FORA_TOPK" not in report
    assert "NEO4J_METHOD" not in report


def test_batch_test_algos_start_index(tmp_path, monkeypatch):
    """'MC:2' skips the section's first 2 params with an explicit note —
    banking the NEXT param of a sweep whose earlier params are already
    recorded (their prep stores were deleted after each test, so a plain
    re-run would repay them in full)."""
    monkeypatch.chdir(tmp_path)
    from ppr_tpu.cli import load_dataset

    ds = load_dataset("synth:200x4@3")
    h = PerfHarness(ds, seed=0, out_dir=str(tmp_path), progress=False)
    h.algo_perf_batch_test(query_num=2, k=5, sweep="got", tests=(2,),
                           budget_s=1.0, algos={"MC:2"})
    report = (tmp_path / f"{ds.name}_AlgoPerfResults.txt").read_text()
    assert "2.3 MC" in report
    assert "skipped (already recorded): [1.0, 0.5]" in report
    # first data row is the THIRD param of the got MC topk array (0.3)
    lines = [ln for ln in report.splitlines() if ln.startswith("0.")]
    assert lines and lines[0].startswith("0.3,")
