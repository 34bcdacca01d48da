"""AMI NXT-XML processor golden tests on a synthetic AMI-format corpus
(reference behavior: action-item-detection/data_script/ami_process.py)."""

import os

import pytest

from spokennlp_tpu.data import ami

NITE = "http://nite.sourceforge.net/"


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def _make_corpus(root, meet="ES2002a"):
    """Two speakers, four dialogue acts; act A.2 is linked to an action."""
    d = str(root)
    _write(os.path.join(d, "ontologies", "da-types.xml"), f"""<?xml version="1.0"?>
<root xmlns:nite="{NITE}">
  <da-type nite:id="cls_1" gloss="Task">
    <da-type nite:id="ami_da_1" gloss="Inform"/>
    <da-type nite:id="ami_da_2" gloss="Suggest"/>
  </da-type>
</root>""")
    _write(os.path.join(d, "words", f"{meet}.A.words.xml"), f"""<?xml version="1.0"?>
<nite:root xmlns:nite="{NITE}">
  <w nite:id="{meet}.A.words0" starttime="1.0" endtime="1.2">we</w>
  <w nite:id="{meet}.A.words1" starttime="1.2" endtime="1.5">should</w>
  <w nite:id="{meet}.A.words2" starttime="1.5" endtime="1.9">order</w>
  <disfmarker nite:id="{meet}.A.words3" starttime="1.9" endtime="2.0"/>
  <w nite:id="{meet}.A.words4" starttime="5.0" endtime="5.5">chips</w>
  <w nite:id="{meet}.A.words5" endtime="5.9">tomorrow</w>
</nite:root>""")
    _write(os.path.join(d, "words", f"{meet}.B.words.xml"), f"""<?xml version="1.0"?>
<nite:root xmlns:nite="{NITE}">
  <w nite:id="{meet}.B.words0" starttime="3.0" endtime="3.4">sounds</w>
  <w nite:id="{meet}.B.words1" starttime="3.4" endtime="3.8">good</w>
</nite:root>""")
    _write(os.path.join(d, "dialogueActs", f"{meet}.A.dialog-act.xml"),
           f"""<?xml version="1.0"?>
<nite:root xmlns:nite="{NITE}">
  <dact nite:id="{meet}.A.da.1">
    <nite:pointer role="da-aspect" href="da-types.xml#id(ami_da_1)"/>
    <nite:child href="{meet}.A.words.xml#id({meet}.A.words0)..id({meet}.A.words2)"/>
  </dact>
  <dact nite:id="{meet}.A.da.2">
    <nite:pointer role="da-aspect" href="da-types.xml#id(ami_da_2)"/>
    <nite:child href="{meet}.A.words.xml#id({meet}.A.words4)..id({meet}.A.words5)"/>
  </dact>
</nite:root>""")
    _write(os.path.join(d, "dialogueActs", f"{meet}.B.dialog-act.xml"),
           f"""<?xml version="1.0"?>
<nite:root xmlns:nite="{NITE}">
  <dact nite:id="{meet}.B.da.1">
    <nite:child href="{meet}.B.words.xml#id({meet}.B.words0)..id({meet}.B.words1)"/>
  </dact>
</nite:root>""")
    _write(os.path.join(d, "abstractive", f"{meet}.abssumm.xml"),
           f"""<?xml version="1.0"?>
<nite:root xmlns:nite="{NITE}">
  <abstract>
    <sentence nite:id="{meet}.s.1">The team discussed snacks.</sentence>
  </abstract>
  <actions>
    <sentence nite:id="{meet}.action.1">Order chips for tomorrow.</sentence>
  </actions>
  <decisions/>
  <problems/>
</nite:root>""")
    _write(os.path.join(d, "extractive", f"{meet}.summlink.xml"),
           f"""<?xml version="1.0"?>
<nite:root xmlns:nite="{NITE}">
  <summlink nite:id="{meet}.link.1">
    <nite:pointer role="extractive" href="{meet}.A.dialog-act.xml#id({meet}.A.da.2)"/>
    <nite:pointer role="abstractive" href="{meet}.abssumm.xml#id({meet}.action.1)"/>
  </summlink>
  <summlink nite:id="{meet}.link.2">
    <nite:pointer role="extractive" href="{meet}.A.dialog-act.xml#id({meet}.A.da.1)"/>
    <nite:pointer role="abstractive" href="{meet}.abssumm.xml#id({meet}.s.1)"/>
  </summlink>
</nite:root>""")
    return d


def test_parsers(tmp_path):
    d = _make_corpus(tmp_path)
    meet = "ES2002a"
    abstracts = ami.parse_abstractive(
        os.path.join(d, "abstractive", f"{meet}.abssumm.xml"))
    assert abstracts["action"] == {f"{meet}.action.1": "Order chips for tomorrow."}
    assert f"{meet}.s.1" in abstracts["abstract"]

    links = ami.parse_extractive(
        os.path.join(d, "extractive", f"{meet}.summlink.xml"))
    assert links[f"{meet}.A.da.2"] == [f"{meet}.action.1"]

    types = ami.parse_da_types(os.path.join(d, "ontologies", "da-types.xml"))
    assert types["ami_da_2"] == "Task#Suggest"

    words = ami.parse_words(os.path.join(d, "words", f"{meet}.A.words.xml"))
    assert words[3]["word"] == "..."          # disfmarker
    assert words[5]["start_time"] == 5.5      # inherits previous end time

    das = ami.parse_dialogue_acts(
        os.path.join(d, "dialogueActs", f"{meet}.A.dialog-act.xml"), types)
    assert das[f"{meet}.A.da.1"]["dact_types"] == "Task#Inform"
    assert das[f"{meet}.A.da.2"]["start_id"] == 4
    # pointer-less act defaults to Unlab
    das_b = ami.parse_dialogue_acts(
        os.path.join(d, "dialogueActs", f"{meet}.B.dialog-act.xml"), types)
    assert das_b[f"{meet}.B.da.1"]["dact_types"] == "Unlab#Unlab"


def test_full_corpus_build_schema_and_labels(tmp_path):
    d = _make_corpus(tmp_path)  # ES2002a -> train split
    out = str(tmp_path / "dataset")
    splits = ami.process_ami_corpus(d, out)
    train = splits["train"]
    assert splits["dev"] == [] and splits["test"] == []
    # 3 sentences across both speakers, time-ordered
    by_sid = sorted(train, key=lambda r: r["sentence_id"])
    assert [r["sentence"] for r in by_sid] == [
        "we should order",            # 1.0s (disfmarker in span 0..2? no: 0..2)
        "sounds good",                # 3.0s, speaker B interleaved by time
        "chips tomorrow",             # 5.0s
    ]
    labels = {r["sentence"]: r["action_label"] for r in train}
    assert labels["chips tomorrow"] == 1   # linked to the <actions> item
    assert labels["we should order"] == 0  # linked only to <abstract>
    assert labels["sounds good"] == 0
    row = next(r for r in train if r["sentence"] == "chips tomorrow")
    assert row["action_description"] == "Order chips for tomorrow."
    # context fields: neighbors with @@@label tags; boundary renders as ###
    assert row["left_context"] == "sounds good@@@0###we should order@@@0"
    assert row["right_context"] == "###"
    assert row["document_length"] == 3
    # TSV files exist with the right column count
    with open(os.path.join(out, "train.txt")) as f:
        lines = [l.rstrip("\n").split("\t") for l in f]
    assert len(lines) == len(train)
    assert all(len(l) == len(ami.DEFAULT_FIELDS) for l in lines)


def test_meeting_without_linked_actions_dropped(tmp_path):
    d = _make_corpus(tmp_path)
    meet = "ES2002a"
    # remove the action link: meeting becomes invalid (is_valid_meeting)
    p = os.path.join(d, "extractive", f"{meet}.summlink.xml")
    s = open(p).read().replace(f"id({meet}.action.1)", f"id({meet}.s.1)")
    open(p, "w").write(s)
    splits = ami.process_ami_corpus(d, str(tmp_path / "ds2"))
    assert splits["train"] == []


def test_balance_interleaving():
    rows = [{"action_label": 0}] * 6 + [{"action_label": 1}] * 2
    out = ami.balance_by_interleaving(rows)
    assert len(out) == 8
    # positives spread through the list, not clumped at the end
    pos_idx = [i for i, r in enumerate(out) if r["action_label"] == 1]
    assert pos_idx[0] == 0 and pos_idx[1] == 4


def test_split_table():
    assert ami.which_split("ES2002a") == "train"
    assert ami.which_split("ES2003d") == "dev"
    assert ami.which_split("TS3007b") == "test"
    assert ami.which_split("XX9999") == "none"


def test_run_process_data_ami(tmp_path):
    from spokennlp_tpu.cli import run_process_data

    d = _make_corpus(tmp_path)
    out = str(tmp_path / "ds")
    run_process_data.main([
        "--dataset", "ami", "--data_folder", d, "--out_folder", out,
        "--ami_meetings_jsonl",
    ])
    assert os.path.exists(os.path.join(out, "train.txt"))
    import json
    rows = [json.loads(l) for l in open(os.path.join(out, "train_meetings.jsonl"))]
    assert rows and rows[0]["sentences"][0]["text"]
