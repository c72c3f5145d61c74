"""Archive-gated real-data dress rehearsals (VERDICT r2 item 9).

The real benchmark archives cannot be downloaded here (no egress), so
these tests build REALISTIC MINIATURE archives — real headers, real file
layouts, deliberate edge cases — and drive each `get_data` end-to-end
through its archive-parse-cache-preprocess path. After these, the only
step untested on real data is the download itself.

Formats exercised:
  * sepsis: PhysioNet-2019 training_set{A,B}.zip of .psv records
    (41-column header per the challenge spec; datasets/sepsis.py:20-154)
  * UEA: Multivariate2018_ts.zip -> <name>_TRAIN/_TEST.ts (sktime .ts
    format with @metadata, '?' missing values, unequal lengths;
    datasets/uea.py:17-178)
  * PhysioNet-2012: set-{a,b}.tar.gz of Time,Parameter,Value records
    (benchmark_interpolation/physionet.py:43-)
  * SpeechCommands: speech_commands_v0.02.tar.gz of 16 kHz 16-bit wavs
    under keyword dirs (datasets/speech_commands.py)
  * PersonActivity: ConfLongDemo_JSI.txt of seq,tag,ts,date,x,y,z,label
    records (benchmark_interpolation/person_activity.py:123-190)
"""

import io
import os
import tarfile
import wave
import zipfile

import numpy as np
import pytest

SEPSIS_HEADER = (
    "HR|O2Sat|Temp|SBP|MAP|DBP|Resp|EtCO2|BaseExcess|HCO3|FiO2|pH|PaCO2|"
    "SaO2|AST|BUN|Alkalinephos|Calcium|Chloride|Creatinine|"
    "Bilirubin_direct|Glucose|Lactate|Magnesium|Phosphate|Potassium|"
    "Bilirubin_total|TroponinI|Hct|Hgb|PTT|WBC|Fibrinogen|Platelets|"
    "Age|Gender|Unit1|Unit2|HospAdmTime|ICULOS|SepsisLabel"
)


def _psv_record(rng, hours, label_from=None, age=60.0, iculos_offset=1):
    """One .psv text: sparse vitals, NaN gaps, static cols repeated."""
    lines = [SEPSIS_HEADER]
    ncols = len(SEPSIS_HEADER.split("|"))
    for h in range(hours):
        row = []
        for c in range(34):
            if rng.random() < 0.85:
                row.append("NaN")
            else:
                row.append(f"{rng.normal(80, 10):.2f}")
        row += [f"{age:.0f}", "1", "0", "1", "-0.03",
                str(h + iculos_offset)]
        label = 0
        if label_from is not None and h >= label_from:
            label = 1
        row.append(str(label))
        assert len(row) == ncols
        lines.append("|".join(row))
    return "\n".join(lines) + "\n"


def test_sepsis_archive_end_to_end(tmp_path):
    from snsde.data.sepsis import MAX_HOURS, get_data

    rng = np.random.default_rng(0)
    for zname, records in (
        ("training_setA.zip", [
            ("training/p000001.psv", _psv_record(rng, 48)),
            ("training/p000002.psv", _psv_record(rng, 80, label_from=60)),
            # record entirely outside hour window 1..72 -> skipped
            ("training/p000003.psv",
             _psv_record(rng, 5, iculos_offset=200)),
            ("training/readme.txt", "not a psv"),
        ]),
        ("training_setB.zip", [
            ("training_setB/p100001.psv",
             _psv_record(rng, 72, label_from=10)),
            # short stay + empty fields
            ("training_setB/p100002.psv",
             SEPSIS_HEADER + "\n" + "|".join(
                 [""] * 34 + ["70", "0", "0", "0", "-1.0", "3", "0"]
             ) + "\n"),
        ]),
    ):
        with zipfile.ZipFile(tmp_path / zname, "w") as zf:
            for name, text in records:
                zf.writestr(name, text)

    X, static, y, lengths, times = get_data(data_dir=str(tmp_path),
                                            synthetic_fallback=False)
    assert X.shape == (4, MAX_HOURS, 34)       # p000003 skipped
    assert static.shape == (4, 5)
    assert np.isfinite(static).all()
    # labels: max over SepsisLabel per stay
    assert sorted(y.tolist()) == [0, 0, 1, 1]
    assert (lengths == MAX_HOURS).all()
    # p000002: rows past hour 72 dropped but the in-window septic hours
    # remain -> label 1 (matches reference's per-stay max)
    # cache round-trip: second call loads the parsed cache
    X2, *_ = get_data(data_dir=str(tmp_path), synthetic_fallback=False)
    np.testing.assert_array_equal(X, X2)
    # ...and feeds the classification preprocessor
    from snsde.data.common import preprocess_classification

    data = preprocess_classification(X, y, lengths, use_intensity=True,
                                     seed=0, times=times)
    assert "train" in data and "coeffs" in data["train"]


TS_HEADER = """#Miniature of a UEA multivariate .ts file
@problemName MiniMotions
@timeStamps false
@missing true
@univariate false
@dimensions 2
@equalLength false
@seriesLength 8
@classLabel true walk run
@data
"""


def _ts_case(rng, n, label, missing=False):
    dims = []
    for _ in range(2):
        vals = [f"{v:.3f}" for v in rng.normal(size=n)]
        if missing:
            vals[1] = "?"
        dims.append(",".join(vals))
    return ":".join(dims) + ":" + label


def test_uea_zip_end_to_end(tmp_path):
    from snsde.data.uea import ARCHIVE_URL, get_data

    rng = np.random.default_rng(1)
    train = TS_HEADER + "\n".join(
        [_ts_case(rng, 8, "walk"), _ts_case(rng, 8, "run", missing=True),
         _ts_case(rng, 6, "walk")]          # unequal length -> resampled
    ) + "\n"
    test = TS_HEADER + "\n".join(
        [_ts_case(rng, 8, "run"), _ts_case(rng, 8, "walk")]
    ) + "\n"
    zpath = tmp_path / os.path.basename(ARCHIVE_URL)
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("Multivariate_ts/MiniMotions/MiniMotions_TRAIN.ts",
                    train)
        zf.writestr("Multivariate_ts/MiniMotions/MiniMotions_TEST.ts",
                    test)

    X, y, times = get_data(name="MiniMotions", data_dir=str(tmp_path),
                           synthetic_fallback=False)
    assert X.shape == (5, 8, 2)            # auto-extracted from the zip
    assert sorted(np.unique(y).tolist()) == [0, 1]
    assert times.shape == (8,)
    # the '?' became NaN then linear-resampled away or kept finite
    from snsde.harness.robustness import preprocess_ists

    data = preprocess_ists(X, missing_rate=0.3, seed=0)
    assert data["seq"].shape == (5, 3, 8, 2)


def _physionet2012_record(rid, events):
    lines = ["Time,Parameter,Value", f"00:00,RecordID,{rid}"]
    for ts, param, val in events:
        lines.append(f"{ts},{param},{val}")
    return "\n".join(lines) + "\n"


def test_physionet2012_tar_end_to_end(tmp_path):
    from snsde.data.physionet2012 import PARAMS, get_data

    def make_tar(path, recs):
        with tarfile.open(path, "w:gz") as tf:
            for name, text in recs:
                data = text.encode()
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))

    make_tar(tmp_path / "set-a.tar.gz", [
        ("set-a/132539.txt", _physionet2012_record(132539, [
            ("00:07", "HR", "73"), ("00:07", "Temp", "37.1"),
            ("01:30", "HR", "80"), ("01:30", "NotAParam", "5"),
            ("47:59", "WBC", "10.2"),
            ("00:30", "Weight", "80.6"),     # not in PARAMS -> ignored
        ])),
        ("set-a/empty.txt", "Time,Parameter,Value\n"),  # skipped
    ])
    make_tar(tmp_path / "set-b.tar.gz", [
        ("set-b/142675.txt", _physionet2012_record(142675, [
            ("00:01", "GCS", "15"), ("12:00", "GCS", "14"),
            ("12:00", "HR", "bad-value"),     # malformed -> ignored
        ])),
    ])

    vals, mask, tp = get_data(data_dir=str(tmp_path),
                              synthetic_fallback=False)
    assert vals.shape[0] == 2                # empty record skipped
    L, D = vals.shape[1], vals.shape[2]
    assert D == len(PARAMS)
    assert mask.shape == vals.shape and tp.shape == (2, L)
    # quantized observation cells present exactly where events landed
    assert mask[0].sum() >= 3
    assert (vals[mask == 0] == 0).all()
    # feeds the interpolation harness shapes directly
    assert np.isfinite(vals).all()


def _wav_bytes(x):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_speech_commands_tar_end_to_end(tmp_path):
    from snsde.data.speech_commands import WORDS, get_data

    rng = np.random.default_rng(2)
    t = np.arange(16000) / 16000
    recs = [
        ("yes/a1.wav", _wav_bytes(0.3 * np.sin(2 * np.pi * 300 * t))),
        ("yes/a2.wav", _wav_bytes(0.2 * rng.normal(size=16000))),
        ("no/b1.wav", _wav_bytes(0.3 * np.sin(2 * np.pi * 700 * t))),
        # short clip -> zero-padded to 1 s by the loader
        ("go/c1.wav", _wav_bytes(0.1 * rng.normal(size=8000))),
        # excluded word dir -> ignored
        ("bird/d1.wav", _wav_bytes(0.1 * rng.normal(size=16000))),
        ("_background_noise_/n.wav",
         _wav_bytes(0.05 * rng.normal(size=16000))),
    ]
    with tarfile.open(tmp_path / "speech_commands_v0.02.tar.gz",
                      "w:gz") as tf:
        for name, data in recs:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))

    X, y, lengths, times = get_data(data_dir=str(tmp_path),
                                    synthetic_fallback=False)
    assert X.shape == (4, 161, 20)           # bird/ + noise dir excluded
    assert set(y.tolist()) <= set(range(len(WORDS)))
    assert sorted(y.tolist()) == sorted(
        [WORDS.index("yes"), WORDS.index("yes"), WORDS.index("no"),
         WORDS.index("go")])
    assert np.isfinite(X).all()


def test_person_activity_raw_file_end_to_end(tmp_path):
    from snsde.data.person_activity import COORDS, get_data

    # real ConfLongDemo_JSI.txt layout: seq,tag,timestamp,date,x,y,z,label
    lines = [
        # sequence A1: tags ANKLE_LEFT (slice 0:3) and CHEST (slice 6:9),
        # activity changes walking -> falling mid-sequence
        "A01,010-000-024-033,1000,27.05.2009 14:03:25:847,"
        "4.06,1.89,0.51,walking",
        "A01,020-000-033-111,2000,27.05.2009 14:03:26:120,"
        "3.87,1.62,1.23,walking",
        "A01,010-000-024-033,3000,27.05.2009 14:03:26:397,"
        "4.12,1.90,0.35,falling",
        # unknown tag id -> ignored
        "A01,099-000-000-000,2500,27.05.2009 14:03:26:200,"
        "0.0,0.0,0.0,walking",
        # malformed short line -> ignored
        "A01,010-000-024-033,2600",
        # sequence B1: ANKLE_RIGHT (slice 3:6) only
        "B01,010-000-030-096,500,27.05.2009 15:00:00:000,"
        "3.32,1.10,0.93,sitting",
        "B01,010-000-030-096,600,27.05.2009 15:00:01:000,"
        "3.30,1.12,0.95,sitting",
    ]
    (tmp_path / "ConfLongDemo_JSI.txt").write_text("\n".join(lines) + "\n")

    vals, mask, tp, labels = get_data(data_dir=str(tmp_path),
                                      synthetic_fallback=False)
    N, L, D = vals.shape
    assert (N, D) == (2, 4 * COORDS)
    assert mask.shape == vals.shape
    assert tp.shape == (2, L) and labels.shape == (2, L)

    # A1: span 1000..3000 -> buckets 0, (length-1)//2, length-1
    mid = int(1000 / 2000 * (L - 1))
    assert mask[0, 0, 0:3].all()                 # ANKLE_LEFT at t0
    assert mask[0, mid, 6:9].all()               # CHEST mid-sequence
    assert mask[0, L - 1, 0:3].all()
    assert mask[0].sum() == 9                    # unknown tag dropped
    np.testing.assert_allclose(vals[0, 0, 0:3], [4.06, 1.89, 0.51])
    # first-seen activity order: walking=0, falling=1, sitting=2
    assert labels[0, 0] == 0 and labels[0, L - 1] == 1
    # B1: ANKLE_RIGHT slice only, constant activity
    assert mask[1, :, 3:6].sum() == 6 and mask[1].sum() == 6
    assert labels[1, 0] == 2
    assert np.isfinite(vals).all()
    np.testing.assert_allclose(tp[0], np.linspace(0, 1, L), atol=1e-6)

    # feeds the activity harness's data= path shape contract
    x_all = np.concatenate([vals, mask], axis=-1)
    assert x_all.shape == (2, L, 2 * D)
