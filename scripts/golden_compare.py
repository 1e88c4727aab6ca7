#!/usr/bin/env python3
"""Golden cross-validation: run the reference PySpark pipeline and the graft
Scala pipeline on the bundled sample OMOP data and diff all output columns.

Usage:
  1. Run the reference (pyspark, ANSI off to match its pinned 3.1 semantics):
       PYTHONPATH=/root/reference/src python3 scripts/golden_compare.py --run-reference
  2. Run the graft side:
       sbt "runMain graft.tools.Probe"
  3. Compare:
       python3 scripts/golden_compare.py

Expected: "NONE — full-field golden match".
"""
import math
import sys

import numpy as np
import pyarrow.dataset as ds

REF_OUT = "/tmp/ref_run/out/patient_sequence"
GRAFT_OUT = "/tmp/graft_omop_out2/patient_sequence"


def run_reference():
    import os
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--master local[8] --driver-memory 8g "
        "--conf spark.sql.ansi.enabled=false "
        "--conf spark.sql.session.timeZone=UTC "
        "--conf spark.sql.shuffle.partitions=8 "
        "--conf spark.ui.enabled=false pyspark-shell")
    from cehrbert_data.apps.generate_training_data import main
    from cehrbert_data.decorators import AttType
    main(
        input_folder="/root/reference/sample_data/omop_sample",
        output_folder="/tmp/ref_run/out",
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
        include_inpatient_hour_token=True,
        att_type=AttType.DAY,
        inpatient_att_type=AttType.DAY,
    )


def norm(v):
    if isinstance(v, (float, np.floating)):
        return "NaN" if np.isnan(v) else round(float(v), 6)
    return v


def compare():
    ref = ds.dataset(REF_OUT).to_table().to_pandas().set_index("person_id").sort_index()
    got = ds.dataset(GRAFT_OUT).to_table().to_pandas().set_index("person_id").sort_index()
    assert list(ref.index) == list(got.index), "patient sets differ"
    assert set(ref.columns) == set(got.columns), (
        f"columns differ: {set(ref.columns) ^ set(got.columns)}")
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
    print("columns with mismatches:",
          bad if bad else
          f"NONE — full-field golden match: {len(ref)} patients x {len(ref.columns)} columns")
    return 1 if bad else 0


if __name__ == "__main__":
    if "--run-reference" in sys.argv:
        run_reference()
    else:
        sys.exit(compare())
