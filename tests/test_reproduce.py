"""tools/reproduce_tables.py — the reference's run matrices, encoded.

Pins the plan against the reference's docstring matrices (reference
DT/FT_image_task.py:408-497, DT/FT_audio_task.py:330-378,
DT/FT_text_task.py:620-786, ZS/ZS_task.py:400-496) so a drive-by edit can't
silently change a published hyperparameter.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import reproduce_tables as rt  # noqa: E402


def _flag(args, name):
    return args[args.index(name) + 1]


def test_full_plan_size_and_order():
    plan = rt.build_plan(["ft_image", "ft_audio", "ft_text", "zs_image",
                          "zs_audio", "zs_task"], ["base", "large"],
                         [False, True])
    # 60 image + 60 audio + 96 text + 24 zs_img + 60 zs_aud + 48 zs_task
    assert len(plan) == 348
    by_family = {}
    for fam, _ in plan:
        by_family[fam] = by_family.get(fam, 0) + 1
    assert by_family == {"ft_image": 60, "ft_audio": 60, "ft_text": 96,
                         "zs_image": 24, "zs_audio": 60, "zs_task": 48}


def test_reference_hyperparameters_pinned():
    plan = rt.build_plan(["ft_image", "ft_text", "ft_audio"], ["base", "large"],
                         [False, True])
    # Base/prompt Flowers-102 uses LR 3e-5 (FT_image_task.py docstring)
    rows = [a for f, a in plan if f == "ft_image"
            and _flag(a, "--DATASET") == "flowers"
            and _flag(a, "--IS_BASE") == "True"
            and _flag(a, "--IS_CAPTIONED") == "False"]
    assert len(rows) == 3 and all(_flag(a, "--LR") == "3e-05" for a in rows)
    assert all(_flag(a, "--EPOCHS") == "25" for a in rows)
    # Base/prompt ImageNet: LR 1e-4
    rows = [a for f, a in plan if f == "ft_image"
            and _flag(a, "--DATASET") == "imagenet"
            and _flag(a, "--IS_BASE") == "True"
            and _flag(a, "--IS_CAPTIONED") == "False"]
    assert all(_flag(a, "--LR") == "0.0001" for a in rows)
    # Base/prompt QNLI drops to batch 256 (captioned stays 320)
    qnli = {(_flag(a, "--IS_CAPTIONED")): _flag(a, "--BATCH_SIZE")
            for f, a in plan if f == "ft_text"
            and _flag(a, "--DATASET") == "qnli"
            and _flag(a, "--IS_BASE") == "True"}
    assert qnli == {"False": "256", "True": "320"}
    # Large cola: batch 320, 3 epochs
    rows = [a for f, a in plan if f == "ft_text"
            and _flag(a, "--DATASET") == "cola"
            and _flag(a, "--IS_BASE") == "False"]
    assert rows and all(_flag(a, "--BATCH_SIZE") == "320"
                        and _flag(a, "--EPOCHS") == "3" for a in rows)
    # esc50: seed 17 x folds 1-5; urbansound8k: seed 77 x folds 1-10;
    # Base/captioned esc50 batch is 40 (prompt 44)
    esc = [a for f, a in plan if f == "ft_audio"
           and _flag(a, "--DATASET") == "esc50"
           and _flag(a, "--IS_BASE") == "True"
           and _flag(a, "--IS_CAPTIONED") == "True"]
    assert [_flag(a, "--FOLD") for a in esc] == ["1", "2", "3", "4", "5"]
    assert all(_flag(a, "--SEED") == "17"
               and _flag(a, "--BATCH_SIZE") == "40" for a in esc)
    urb = [a for f, a in plan if f == "ft_audio"
           and _flag(a, "--DATASET") == "urbansound8k"]
    assert all(_flag(a, "--SEED") == "77" for a in urb)


def test_zs_seed_blocks():
    plan = rt.build_plan(["zs_task"], ["base", "large"], [False, True])
    seeds = sorted({int(_flag(a, "--SEED")) for _, a in plan
                    if _flag(a, "--IS_BASE") == "False"
                    and _flag(a, "--IS_CAPTIONED") == "False"})
    assert seeds == [49, 50, 51]  # ZS_task.py docstring block
    mms = {(_flag(a, "--DATASET"), _flag(a, "--MM")) for _, a in plan}
    assert mms == {("cifar-10", "IT"), ("cifar-100", "IT"),
                   ("esc50", "TA"), ("urbansound8k", "TA")}


def test_render_report(tmp_path):
    data = {"base_prompt": {"cifar-10": {
        "seeds": [17, 42], "scores": {"accuracy": {
            "values": [97.1, 97.5], "mean": 97.3, "std": 0.2}}}}}
    with open(tmp_path / "METRIC_IMG.json", "w") as f:
        json.dump(data, f)
    report = rt.render_report(str(tmp_path))
    assert "ft_image" in report and "cifar-10" in report
    assert "97.30±0.20 (n=2)" in report
    assert "base_caption" in report  # all four variant columns render


def test_limit_and_dry_run(capsys):
    rt.main(["--dry_run", "--families", "zs_image", "--sizes", "base",
             "--captioned", "false", "--limit", "2"])
    out = capsys.readouterr().out
    assert out.count("synergy_tpu.eval.zs_image") == 2
    assert "--SEED 25" in out  # base/prompt ZS seed block starts at 25


import pytest


@pytest.mark.slow
def test_every_family_runs_end_to_end(tmp_path):
    """Exercise the WHOLE eval surface through reproduce_tables itself: one
    tiny run per family on the synthetic fallbacks, each in a subprocess
    exactly as the real reproduction would run it, metric JSONs accumulating
    in the workdir and the report rendering from them."""
    families = ["ft_image", "ft_audio", "ft_text",
                "zs_image", "zs_audio", "zs_task"]
    wd = tmp_path / "work"
    for fam in families:
        rt.main(["--families", fam, "--sizes", "base", "--captioned",
                 "false", "--limit", "1", "--tiny",
                 "--workdir", str(wd),
                 "--ckpt_dir", str(tmp_path / "no_ckpt"),
                 "--data_root", str(tmp_path / "no_data")])
    for fname, _ in rt._HEADLINE.values():
        assert (wd / fname).exists(), fname
    report = rt.render_report(str(wd))
    for fam in families:
        assert fam in report, fam
    out = tmp_path / "report.md"
    rt.main(["--report_only", "--workdir", str(wd), "--out", str(out)])
    assert out.exists() and "Reproduced result tables" in out.read_text()
