"""CLI end-to-end: reference database layout -> experiment outputs + resume."""

import os

import pytest

from conftest import random_dna
from khoice_tpu.cli import main
from khoice_tpu.io.fasta import FastaRecord, write_fasta


@pytest.fixture
def database(rng, tmp_path):
    root = tmp_path / "db"
    base = random_dna(rng, 3000)
    for num in (1, 2):
        d = root / f"dataset_{num}"
        d.mkdir(parents=True)
        for g in range(3):
            seq = list(base)
            for _ in range(120 * num + 31 * g):
                seq[rng.randrange(len(base))] = "ACGT"[rng.randrange(4)]
            write_fasta(
                str(d / f"genome_{num}_{g}.fna.gz"),
                [FastaRecord(f"g{num}{g}", "".join(seq))],
            )
    return str(root)


def test_cli_exp1_and_resume(database, tmp_path, capsys):
    work = str(tmp_path / "work1")
    rc = main([
        "run", "--exp-type", "1", "--database-root", database,
        "--work-root", work, "--k-values", "7,9",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(work, "step_5/within_datasets_analysis.csv"))
    assert os.path.exists(os.path.join(work, "step_9/across_datasets_analysis.csv"))
    mtime = os.path.getmtime(os.path.join(work, "step_5/within_datasets_analysis.csv"))
    # second run resumes: outputs untouched
    rc = main([
        "run", "--exp-type", "1", "--database-root", database,
        "--work-root", work, "--k-values", "7,9",
    ])
    assert rc == 0
    assert os.path.getmtime(os.path.join(work, "step_5/within_datasets_analysis.csv")) == mtime
    assert os.path.exists(os.path.join(work, "run_manifest.json"))


def test_cli_exp2_with_exp0(database, tmp_path):
    work = str(tmp_path / "work2")
    rc = main([
        "run", "--exp-type", "2", "--database-root", database,
        "--work-root", work, "--k-values", "7",
        "--kmers-per-dataset", "2000",
    ])
    assert rc == 0
    assert os.path.exists(
        os.path.join(work, "within_dataset_analysis_type_2/within_dataset_analysis.csv")
    )
    # exp0 layout produced as a side effect
    assert os.path.exists(os.path.join(work, "trial_1/exp0_pivot_genomes/dataset_1/pivot_name.txt"))


def test_cli_exp4_in_pivot(database, tmp_path):
    work = str(tmp_path / "work4")
    rc = main([
        "run", "--exp-type", "4", "--database-root", database,
        "--work-root", work, "--k-values", "7",
        "--kmers-per-dataset", "2000",
    ])
    assert rc == 0
    final = os.path.join(work, "accuracies_type_4/accuracy_values.csv")
    assert os.path.exists(final)
    lines = open(final).read().strip().split("\n")
    assert len(lines) == 2  # one k x two pivots


def test_cli_multi_trial_fanout(database, tmp_path):
    """--trials N fans exp0 over trials 1..N (reference NUM_TRIALS,
    prepare_data.smk:42-117) and gives exp0-dependent experiments
    per-trial subroots so runs don't clobber each other."""
    work = str(tmp_path / "workmt")
    rc = main([
        "run", "--exp-type", "0", "--database-root", database,
        "--work-root", work, "--trials", "2", "--kmers-per-dataset", "1000",
    ])
    assert rc == 0
    for t in (1, 2):
        assert os.path.exists(
            os.path.join(work, f"trial_summaries/trial_{t}_summary.txt")
        )
        assert os.path.isdir(os.path.join(work, f"trial_{t}/exp0_pivot_reads"))

    rc = main([
        "run", "--exp-type", "4", "--database-root", database,
        "--work-root", work, "--trials", "2", "--k-values", "7,9",
        "--kmers-per-dataset", "1000",
    ])
    assert rc == 0
    for t in (1, 2):
        assert os.path.exists(
            os.path.join(work, f"trial_{t}_results/accuracies_type_4/accuracy_values.csv")
        )
