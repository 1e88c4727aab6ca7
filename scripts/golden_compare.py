#!/usr/bin/env python3
"""Golden cross-validation: run the reference PySpark pipeline and the graft
Scala pipeline on the bundled sample OMOP data and diff all output columns,
in BOTH tested configurations.

Usage:
  1. Run the reference (pyspark, ANSI off to match its pinned 3.1 semantics)
     — writes /tmp/ref_run/out (config 1) and /tmp/ref_run2/out (config 2);
     skipped per-config when the output already exists:
       PYTHONPATH=/root/reference/src python3 scripts/golden_compare.py --run-reference
  2. Run the graft side (writes both configs):
       sbt "runMain graft.tools.Probe"
  3. Compare both pairs:
       python3 scripts/golden_compare.py

Expected: "NONE — full-field golden match" twice.

Config 1: day ATT, day inpatient ATT, inpatient hour tokens, demographics.
Config 2: cehr_bert ATT, mix inpatient ATT, age-group demographic tokens.
"""
import math
import os
import sys

import numpy as np
import pyarrow.dataset as ds

CONFIGS = [
    ("config1 day/day+hour", "/tmp/ref_run/out", "/tmp/graft_omop_out2"),
    ("config2 cehr_bert/mix+age-group", "/tmp/ref_run2/out", "/tmp/graft_omop_run2"),
    # config 3 runs on a COPY of the sample data augmented with a synthetic
    # death table (the bundled sample has none), exercising DeathEventDecorator
    ("config3 day/day+death", "/tmp/ref_run3/out", "/tmp/graft_omop_run3"),
    # config 4 runs on a copy of the sample with injected orphan condition
    # events: problem-list disconnect -> interval re-link -> artificial visits
    ("config4 day/day+artificial-visits", "/tmp/ref_run4/out", "/tmp/graft_omop_run4"),
    ("config5 day/day+exclude-visit-tokens", "/tmp/ref_run5/out", "/tmp/graft_omop_run5"),
    ("config6 classic-bert", "/tmp/ref_run6/out", "/tmp/graft_omop_run6"),
]

AV_INPUT = "/tmp/omop_sample_av"


def make_av_input():
    """Copy the sample CDM and append orphan condition events (null visit id):
    one inside an existing visit span, one 4000 days out, for 6 patients."""
    import shutil
    import glob
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = "/root/reference/sample_data/omop_sample"
    marker = f"{AV_INPUT}/condition_occurrence"
    if os.path.exists(AV_INPUT):
        co_probe = ds.dataset(marker).to_table().to_pandas()
        if (co_probe["condition_source_value"] == "orphan").any():
            return
        shutil.rmtree(AV_INPUT)
    shutil.copytree(src, AV_INPUT)
    co = ds.dataset(f"{AV_INPUT}/condition_occurrence").to_table().to_pandas()
    v = ds.dataset(f"{AV_INPUT}/visit_occurrence").to_table().to_pandas()
    rows, next_id = [], 90000
    for pid in sorted(v["person_id"].astype(int).unique())[:6]:
        pv = v[v["person_id"].astype(int) == pid].iloc[0]
        inside = pd.to_datetime(pv["visit_start_date"])
        outside = inside + pd.Timedelta(days=4000)
        for d in (inside, outside):
            rows.append(dict(condition_occurrence_id=str(next_id), person_id=str(pid),
                condition_concept_id="78272",
                condition_start_date=d.strftime("%Y-%m-%d"),
                condition_start_datetime=d.strftime("%Y-%m-%d %H:%M:%S.%f"),
                condition_end_date=None, condition_end_datetime=None,
                condition_type_concept_id="32020", condition_status_concept_id=None,
                stop_reason=None, provider_id=None, visit_occurrence_id=None,
                condition_source_value="orphan", condition_source_concept_id="0",
                condition_status_source_value=None))
            next_id += 1
    aug = pd.concat([co, pd.DataFrame(rows)], ignore_index=True)
    for f in glob.glob(f"{AV_INPUT}/condition_occurrence/*"):
        os.remove(f)
    pq.write_table(pa.Table.from_pandas(aug, preserve_index=False),
                   f"{AV_INPUT}/condition_occurrence/part-0.parquet")

DEATH_INPUT = "/tmp/omop_sample_death"


def make_death_input():
    """Copy the sample CDM and add a deterministic death table (5 patients,
    death 30 days after their last visit end)."""
    import shutil
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = "/root/reference/sample_data/omop_sample"
    if os.path.exists(f"{DEATH_INPUT}/death"):
        return
    if os.path.exists(DEATH_INPUT):
        shutil.rmtree(DEATH_INPUT)
    shutil.copytree(src, DEATH_INPUT)
    visits = ds.dataset(f"{src}/visit_occurrence").to_table().to_pandas()
    last = visits.groupby("person_id")["visit_end_date"].max().reset_index()
    chosen = last.sort_values("person_id").head(5)
    rows = []
    for _, r in chosen.iterrows():
        d = pd.to_datetime(r["visit_end_date"]) + pd.Timedelta(days=30)
        rows.append(dict(person_id=int(r["person_id"]), death_date=d,
                         death_datetime=d.to_pydatetime(),
                         death_type_concept_id=38003566, cause_concept_id=0,
                         cause_source_value=None, cause_source_concept_id=0))
    df = pd.DataFrame(rows)
    # explicit us/date32 schema: pandas defaults to TIMESTAMP(NANOS), which
    # plain pyspark (no nanosAsLong) refuses to read
    schema = pa.schema([
        ("person_id", pa.int64()),
        ("death_date", pa.date32()),
        ("death_datetime", pa.timestamp("us")),
        ("death_type_concept_id", pa.int64()),
        ("cause_concept_id", pa.int64()),
        ("cause_source_value", pa.string()),
        ("cause_source_concept_id", pa.int64()),
    ])
    df["death_date"] = df["death_date"].dt.date
    os.makedirs(f"{DEATH_INPUT}/death", exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False),
                   f"{DEATH_INPUT}/death/part-0.parquet")


def run_reference():
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--master local[8] --driver-memory 8g "
        "--conf spark.sql.ansi.enabled=false "
        "--conf spark.sql.session.timeZone=UTC "
        "--conf spark.sql.shuffle.partitions=8 "
        "--conf spark.ui.enabled=false pyspark-shell")
    from cehrbert_data.apps.generate_training_data import main
    from cehrbert_data.decorators import AttType

    common = dict(
        input_folder="/root/reference/sample_data/omop_sample",
        domain_table_list=["condition_occurrence", "drug_exposure", "procedure_occurrence"],
        date_filter="1985-01-01",
        include_visit_type=True,
        is_new_patient_representation=True,
        exclude_visit_tokens=False,
        is_classic_bert=False,
        include_prolonged_stay=False,
        include_concept_list=False,
        gpt_patient_sequence=True,
        apply_age_filter=True,
        include_death=False,
    )
    if not os.path.exists("/tmp/ref_run/out/patient_sequence"):
        main(output_folder="/tmp/ref_run/out",
             att_type=AttType.DAY, inpatient_att_type=AttType.DAY,
             include_inpatient_hour_token=True, **common)
    if not os.path.exists("/tmp/ref_run2/out/patient_sequence"):
        main(output_folder="/tmp/ref_run2/out",
             att_type=AttType.CEHR_BERT, inpatient_att_type=AttType.MIX,
             use_age_group=True, include_inpatient_hour_token=False, **common)
    if not os.path.exists("/tmp/ref_run3/out/patient_sequence"):
        make_death_input()
        cfg3 = dict(common, input_folder=DEATH_INPUT, include_death=True)
        main(output_folder="/tmp/ref_run3/out",
             att_type=AttType.DAY, inpatient_att_type=AttType.DAY,
             include_inpatient_hour_token=False, **cfg3)
    if not os.path.exists("/tmp/ref_run5/out/patient_sequence"):
        cfg5 = dict(common)
        cfg5["exclude_visit_tokens"] = True
        main(output_folder="/tmp/ref_run5/out",
             att_type=AttType.DAY, inpatient_att_type=AttType.DAY,
             include_inpatient_hour_token=False, **cfg5)
    if not os.path.exists("/tmp/ref_run6/out/patient_sequence"):
        cfg6 = dict(common)
        cfg6["is_new_patient_representation"] = False
        cfg6["is_classic_bert"] = True
        main(output_folder="/tmp/ref_run6/out",
             att_type=AttType.DAY, inpatient_att_type=AttType.DAY,
             include_inpatient_hour_token=False, **cfg6)
    if not os.path.exists("/tmp/ref_run4/out/patient_sequence"):
        make_av_input()
        cfg4 = dict(common, input_folder=AV_INPUT)
        main(output_folder="/tmp/ref_run4/out",
             att_type=AttType.DAY, inpatient_att_type=AttType.DAY,
             include_inpatient_hour_token=False,
             should_construct_artificial_visits=True,
             disconnect_problem_list_records=True, **cfg4)


def norm(v):
    if isinstance(v, (float, np.floating)):
        return "NaN" if np.isnan(v) else round(float(v), 6)
    return v


def compare_one(name, ref_out, graft_out):
    ref = ds.dataset(f"{ref_out}/patient_sequence").to_table().to_pandas() \
        .set_index("person_id").sort_index()
    got = ds.dataset(f"{graft_out}/patient_sequence").to_table().to_pandas() \
        .set_index("person_id").sort_index()
    assert list(ref.index) == list(got.index), f"{name}: patient sets differ"
    assert set(ref.columns) == set(got.columns), (
        f"{name}: columns differ: {set(ref.columns) ^ set(got.columns)}")
    bad = {}
    for c in ref.columns:
        n = 0
        for pid in ref.index:
            r, g = ref.loc[pid, c], got.loc[pid, c]
            if hasattr(r, "__len__") and not isinstance(r, str):
                if [norm(x) for x in r] != [norm(x) for x in g]:
                    n += 1
            elif norm(r) != norm(g):
                n += 1
        if n:
            bad[c] = n
    print(f"[{name}] columns with mismatches:",
          bad if bad else
          f"NONE — full-field golden match: {len(ref)} patients x {len(ref.columns)} columns")
    return 1 if bad else 0


def compare():
    return max(compare_one(*cfg) for cfg in CONFIGS)


if __name__ == "__main__":
    if "--run-reference" in sys.argv:
        run_reference()
    else:
        sys.exit(compare())
