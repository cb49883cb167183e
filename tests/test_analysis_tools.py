"""Downloads (stubbed), confusion rollup, MSA entropy, plot smoke tests."""

import csv
import math
import os

import numpy as np
import pytest

from khoice_tpu.analysis.confusion_rollup import rollup_confusion_dir
from khoice_tpu.analysis.msa import (
    column_entropy,
    find_cut_points,
    msa_entropy,
    rolling_average,
    sections_from_cuts,
)
from khoice_tpu.tools.download import (
    download_genomes,
    esearch_ftp_paths,
    genomic_fna_url,
    protein_faa_url,
)


def test_download_stubbed(tmp_path):
    calls = []

    def runner(cmd, stdin=None):
        calls.append(cmd)
        if cmd[0] == "bash":
            return (
                "ftp://ncbi/genomes/all/GCF_000001\n"
                "ftp://ncbi/genomes/all/GCF_000002\n"
            )
        return ""

    db = download_genomes(
        ["Escherichia coli", "Salmonella enterica"],
        str(tmp_path),
        num_genomes=1,
        runner=runner,
    )
    assert os.path.basename(db) == "database_1"
    assert os.path.exists(os.path.join(db, "README_dataset_summary.txt"))
    urls = open(os.path.join(db, "data/dataset_1/url_list.txt")).read()
    assert urls.strip() == "ftp://ncbi/genomes/all/GCF_000001/GCF_000001_genomic.fna.gz"
    # second call auto-numbers
    db2 = download_genomes(["X"], str(tmp_path), runner=runner)
    assert os.path.basename(db2) == "database_2"


def test_url_builders():
    d = "https://ftp.ncbi.nlm.nih.gov/genomes/all/GCF_0001.1_ASM"
    assert genomic_fna_url(d).endswith("GCF_0001.1_ASM_genomic.fna.gz")
    assert protein_faa_url(d).endswith("GCF_0001.1_ASM_protein.faa.gz")


def test_rollup(tmp_path):
    mdir = tmp_path / "m"
    mdir.mkdir()
    for k in ("7", "8"):
        with open(mdir / f"k_{k}_confusion_matrix.csv", "w") as fd:
            fd.write("5,1,0\n2,6,0\n")
    out = rollup_confusion_dir(str(mdir), 2, str(tmp_path), "short", k_values=["7", "8"])
    rows = open(out, newline="").read().strip().split("\r\n")
    assert len(rows) == 4
    first = rows[0].split(",")
    assert first[:2] == ["7", "0"] and float(first[2]) == 5.0


def test_msa_entropy():
    assert column_entropy("AAAA") == 0.0
    assert abs(column_entropy("ACGT") - 2.0) < 1e-12
    rows = ["ACGT", "ACGA", "ACGC"]
    ent = msa_entropy(rows)
    assert ent[0] == ent[1] == ent[2] == 0.0 and ent[3] > 0
    sm = rolling_average(np.array([1.0, 1.0, 0.0, 0.0]), window=2)
    assert sm.tolist() == [1.0, 1.0, 0.5, 0.0]
    cuts = find_cut_points(np.array([0.1, 0.1, 0.9, 0.05]), threshold=0.3, min_gap=2)
    assert cuts == [0, 3]
    assert sections_from_cuts(10, [3]) == [(0, 3), (3, 10)]


def test_plots_smoke(tmp_path):
    from khoice_tpu.analysis import plots

    step5 = tmp_path / "step5.csv"
    with open(step5, "w") as fd:
        fd.write(
            "group_num,k,percent_1_occ,percent_25_or_less,percent_25_to_75,"
            "percent_75_or_more,unique_stat,unique_stat_norm,delta_frac,delta_frac_norm\n"
        )
        for g in ("group_1", "group_2"):
            for k in (7, 9, 11):
                fd.write(f"{g},{k},0.5,0.2,0.2,0.1,1.5,0.5,100.0,0.9\n")
    out = plots.plot_type1(str(step5), str(tmp_path / "t1.png"))
    assert os.path.getsize(out) > 0

    acc = tmp_path / "acc.csv"
    with open(acc, "w") as fd:
        for k in (7, 9):
            for p in (0, 1):
                fd.write(f"{k},{p},10,20,3,4,10,20,3,4\n")
    out = plots.plot_accuracy_curves(str(acc), str(tmp_path / "f1.png"))
    assert os.path.getsize(out) > 0
    out = plots.plot_species_comparison([str(acc)], str(tmp_path / "sp.png"))
    assert os.path.getsize(out) > 0

    cm = tmp_path / "cm.csv"
    with open(cm, "w") as fd:
        fd.write("5,1\n2,6\n")
    out = plots.plot_confusion_heatmap(str(cm), str(tmp_path / "cm.png"))
    assert os.path.getsize(out) > 0

    t3 = tmp_path / "t3.csv"
    with open(t3, "w") as fd:
        fd.write("read_type,pivot_num,k,dataset_num,intersection_percent\n")
        for rt in ("illumina", "ont"):
            for p in ("1", "2"):
                for k in (7, 9):
                    for ds in ("1", "2"):
                        fd.write(f"{rt},{p},{k},{ds},0.5\n")
    out = plots.plot_type3(str(t3), str(tmp_path / "t3.png"))
    assert os.path.getsize(out) > 0

    out = plots.plot_database_percent({25: str(step5), 100: str(step5)}, str(tmp_path / "dp.png"))
    assert os.path.getsize(out) > 0


def _write_clustal(path, genomes, width=60):
    """Minimal clustal-style writer: 3 header lines, 60-col blocks."""
    length = len(next(iter(genomes.values())))
    with open(path, "w") as fd:
        fd.write("CLUSTAL multiple sequence alignment\n\n\n")
        for lo in range(0, length, width):
            for name, seq in genomes.items():
                fd.write(f"{name} {seq[lo:lo + width]}\n")
            fd.write("cons " + "*" * min(width, length - lo) + "\n")
            fd.write("\n")


@pytest.mark.heavy
def test_msa_reference_surface(tmp_path):
    """parse_msa_file / figures / extract_sections vs src/analyze_msa.py
    semantics: nat-log entropy, 'valid' rolling, 0.35 crossings at
    >=500/>=3000/>=5000, gap-stripped section FASTAs."""
    from khoice_tpu.analysis.msa import (
        analyze_msa_file,
        entropy_scores_nat,
        parse_msa_file,
        reference_rolling,
    )

    # entropy in nats: 2 symbols evenly split -> ln 2
    assert abs(entropy_scores_nat(["AC", "AG"])[1] - math.log(2)) < 1e-12
    assert entropy_scores_nat(["AC", "AG"])[0] == 0.0

    # Alignment: [0,800) conserved, [800,3200) varied, [3200,5200)
    # conserved, [5200,7000) varied -> rolling crossings inside the
    # reference's search windows. g2 carries gaps in the varied spans.
    n = 7000

    def seg(i):
        return (800 <= i < 3200) or (5200 <= i)

    g1 = "".join("C" if seg(i) else "A" for i in range(n))
    g2 = "".join(("-" if i % 97 == 0 else "G") if seg(i) else "A" for i in range(n))
    msa = tmp_path / "virus.msa"
    _write_clustal(str(msa), {"g1": g1, "g2": g2})

    entropy, genomes = parse_msa_file(str(msa))
    assert len(entropy) == n and set(genomes) == {"g1", "g2"}
    assert genomes["g1"] == g1 and genomes["g2"] == g2
    assert entropy[0] == 0.0 and abs(entropy[1000] - math.log(2)) < 1e-12

    roll = reference_rolling(entropy)
    assert len(roll) == n - 249

    outdir = tmp_path / "sections"
    outdir.mkdir()
    analyze_msa_file(str(msa), str(outdir), num_to_extract=2, plots=True)
    for suffix in (".png", ".rolling.png", ".rolling_with_cuts.png"):
        assert os.path.getsize(str(msa) + suffix) > 0
    left0 = open(outdir / "seq_0_left.fna").read()
    assert left0.startswith(">seq_0_left\n")
    # g2's sections must have gaps stripped (left spans the varied
    # region where g2 carries '-' every 97 columns)
    left1 = open(outdir / "seq_1_left.fna").read().splitlines()[1]
    assert "-" not in left1 and len(left1) > 0
    right1 = open(outdir / "seq_1_right.fna").read().splitlines()[1]
    assert "-" not in right1 and len(right1) > 0


def test_plot_species_read_comparison(tmp_path):
    from khoice_tpu.analysis import plots

    csvs = {}
    for rt in ("short", "long"):
        paths = []
        for t in (1, 2):
            p = tmp_path / f"trial_{t}_{rt}_acc.csv"
            with open(p, "w") as fd:
                for k in (7, 9, 11):
                    fd.write(f"{k},0,10,20,{t},4,8,20,{t + 1},6\n")
            paths.append(str(p))
        csvs[rt] = paths
    out = plots.plot_species_read_comparison(csvs, str(tmp_path / "rd.png"))
    assert os.path.getsize(out) > 0


def test_per_script_plotters_on_pipeline_csvs(rng, tmp_path):
    """One plotter per remaining reference R script (kmer_plots_type_2/4/5,
    database_percent_comparison), each consuming CSVs the PIPELINES emit."""
    from conftest import random_dna
    from khoice_tpu.analysis import plots
    from khoice_tpu.pipelines.exp2 import run_exp2
    from khoice_tpu.pipelines.exp6 import run_exp6

    base = random_dna(rng, 300)
    pivots, rest = {}, {}
    for num in (1, 2):
        seqs = []
        for g in range(3):
            s = list(base)
            for _ in range(15 * num + 5 * g):
                s[rng.randrange(len(base))] = "ACGT"[rng.randrange(4)]
            seqs.append("".join(s))
        pivots[num] = [seqs[0]]
        rest[num] = [[x] for x in seqs[1:]]

    # kmer_plots_type_2.R over run_exp2's two CSVs
    out2 = run_exp2(pivots, rest, [7, 9], str(tmp_path / "e2"))
    names = ["Bacillus cereus", "Bacillus anthracis"]
    paths = plots.plot_type2(
        out2["within"], out2["across"], str(tmp_path / "p2"), dataset_names=names
    )
    # reference output-name contract: per-group within/across + 2 curves
    got = {os.path.basename(p) for p in paths}
    assert {
        "within_dataset_1_kmer_analysis.png",
        "within_dataset_2_kmer_analysis.png",
        "within_dataset_unique_stat.png",
        "across_datasets_1_kmer_analysis.png",
        "across_dataset_unique_stat.png",
    } <= got
    assert all(os.path.getsize(p) > 0 for p in paths)

    # kmer_plots_type_4.R over run_exp6's trial CSV + confusion matrix
    reads = {num: [pivots[num][0][i : i + 50] for i in range(0, 200, 25)] for num in rest}
    acc_csv = run_exp6(reads, rest, [7, 9], str(tmp_path / "e6"))
    cm_txt = os.path.join(
        str(tmp_path / "e6"),
        "accuracies_type_6/illumina/confusion_matrix/k_7_confusion_matrix.txt",
    )
    assert os.path.exists(cm_txt)
    p4 = plots.plot_type4(acc_csv, cm_txt, str(tmp_path / "p4"), k=7, dataset_names=names)
    assert {os.path.basename(p) for p in p4} == {
        "accuracy_plot.png",
        "k_7_confusion_matrix_normalized.png",
    }
    assert all(os.path.getsize(p) > 0 for p in p4)

    # kmer_plots_type_5.R over the same matrix shape (exp5's confusion csv)
    p5 = plots.plot_type5(cm_txt, str(tmp_path / "p5"), dataset_names=names)
    assert os.path.basename(p5) == "confusion_matrix_normalized.png"
    assert os.path.getsize(p5) > 0

    # database_percent_comparison.R over across CSVs at two database sizes
    dp = plots.plot_database_percent_bars(
        {25: out2["across"], 100: out2["across"]},
        str(tmp_path / "dp"),
        dataset_names=names,
    )
    assert {os.path.basename(p) for p in dp} == {
        "subset_across_1.png",
        "subset_unique_across_1.png",
        "subset_across_2.png",
        "subset_unique_across_2.png",
    }
    assert all(os.path.getsize(p) > 0 for p in dp)
