"""CLI entry-point tests.

Mirrors the reference's CLI end-to-end test
(``/root/reference/trollflow2/tests/test_cli.py:154-176``): the batch
CLI must create the composed output file from files + product list +
JSON metadata; the launcher must drain a test message and exit.
"""

import json
import os
import shutil
import stat

import pytest

from trollflow2_spark.cli import cli, datetime_decoder, launch


PL_YAML = """
product_list:
  output_dir: "{out}"
  fname_pattern: "{{start_time:%Y%m%d_%H%M}}_{{platform_name}}_{{productname}}.{{format}}"
  workers:
    - fun: check_metadata
      platform_name: [sat1]
    - fun: create_scene
    - fun: save_datasets
  areas:
    area1:
      areaname: area1
      products:
        value:
          productname: chanel_5
          formats:
            - format: parquet
              writer: parquet
"""


@pytest.fixture
def data_file(sf_dir, tmp_path):
    dst = tmp_path / "events.parquet"
    shutil.copy(os.path.join(sf_dir, "events.parquet"), dst)
    return str(dst)


def test_full_chain_cli_is_creating_output_file(tmp_path, data_file):
    """≙ test_full_chain_cli_is_creating_output_file, test_cli.py:154-176."""
    out_dir = tmp_path / "out"
    plist_path = tmp_path / "pl.yaml"
    plist_path.write_text(PL_YAML.format(out=out_dir))
    attrs = {
        "start_time": "2022-02-02T11:22:00",
        "platform_name": "sat1",
        "sensor": "nose",
    }
    summary = cli(
        ["-p", str(plist_path), "-m", json.dumps(attrs), data_file]
    )
    assert summary["status"] == "nominal"
    expected = out_dir / "20220202_1122_sat1_chanel_5.parquet"
    assert expected.exists()
    assert summary["files"] == [str(expected)]


NC_PL_YAML = """
product_list:
  output_dir: "{out}"
  fname_pattern: "{{platform_name}}_{{productname}}.{{format}}"
  workers:
    - fun: create_scene
      reader: netcdf
    - fun: scene_to_wide
    - fun: save_datasets
  areas:
    area1:
      areaname: area1
      products:
        chan5:
          productname: chan5
          formats:
            - format: png
              writer: simple_image
"""


def test_full_chain_cli_netcdf_input_to_png(tmp_path):
    """The reference's primary lifecycle, end-to-end through the CLI:
    satellite NetCDF in (named reader), image file out — with the golden
    pixel value from the reference's own save test
    (arange(100).reshape(10,10) -> stretched [5,5] == 142;
    ≙ tests/test_cli.py:154-191 + test_trollflow2.py:701-768)."""
    import numpy as np

    from trollflow2_spark.sinks import netcdf
    from trollflow2_spark.sinks.imagery import decode_png

    nc_path = str(tmp_path / "input.nc")
    arr = np.arange(100, dtype="float64").reshape(10, 10)
    with open(nc_path, "wb") as fh:
        fh.write(netcdf.encode_netcdf({"chan5": arr}, {"sensor": "nose"}))

    out_dir = tmp_path / "out"
    plist_path = tmp_path / "pl.yaml"
    plist_path.write_text(NC_PL_YAML.format(out=out_dir))
    attrs = {"start_time": "2022-02-02T11:22:00", "platform_name": "sat1"}
    summary = cli(["-p", str(plist_path), "-m", json.dumps(attrs), nc_path])
    assert summary["status"] == "nominal"
    out_file = out_dir / "sat1_chan5.png"
    assert out_file.exists()
    with open(out_file, "rb") as fh:
        img = decode_png(fh.read())
    assert img.shape == (10, 10)
    assert img[5, 5] == 142  # the reference's golden stretched pixel


def test_cli_metadata_gate_aborts(tmp_path, data_file):
    out_dir = tmp_path / "out"
    plist_path = tmp_path / "pl.yaml"
    plist_path.write_text(PL_YAML.format(out=out_dir))
    summary = cli(
        [
            "-p", str(plist_path),
            "-m", json.dumps({"start_time": "2022-02-02T11:22:00",
                              "platform_name": "WRONG"}),
            data_file,
        ]
    )
    assert summary["status"] == "aborted"
    assert summary["n_produced"] == 0


def test_datetime_decoder_nested():
    got = datetime_decoder({"a": "2022-02-02T11:22:00", "b": ["x", "2023-01-01T00:00:00"], "c": 5})
    import datetime

    assert got["a"] == datetime.datetime(2022, 2, 2, 11, 22)
    assert got["b"][1] == datetime.datetime(2023, 1, 1)
    assert got["b"][0] == "x" and got["c"] == 5


def test_launcher_drains_test_message(tmp_path, data_file):
    """-m test_message drains availableNow and exits
    (≙ launcher.py:206-215 offline mode)."""
    out_dir = tmp_path / "out"
    plist_path = tmp_path / "pl.yaml"
    plist_path.write_text(PL_YAML.format(out=out_dir))
    msg = {
        "type": "file",
        "uid": "msg-1",
        "platform_name": "sat1",
        "start_time": "2022-02-02T11:22:00",
        "dataset": [{"uri": data_file}],
    }
    msg_path = tmp_path / "msg.json"
    msg_path.write_text(json.dumps(msg))
    results = launch([str(plist_path), "-m", str(msg_path),
                      "--checkpoint", str(tmp_path / "ckpt")])
    assert results == [{"uid": "msg-1", "status": "nominal"}]
    assert (out_dir / "20220202_1122_sat1_chanel_5.parquet").exists()


def test_sendmail_crash_handler(tmp_path):
    """The YAML-named sendmail handler pipes a MIME mail with the
    traceback into the configured binary (≙ sendmail,
    launcher.py:483-499)."""
    from trollflow2_spark.streaming.runner import resolve_crash_handler

    capture = tmp_path / "mail.txt"
    fake_sendmail = tmp_path / "sendmail.sh"
    fake_sendmail.write_text(f"#!/bin/sh\ncat > {capture}\n")
    fake_sendmail.chmod(fake_sendmail.stat().st_mode | stat.S_IEXEC)

    handler = resolve_crash_handler(
        {
            "name": "sendmail",
            "sendmail": {
                "header": "Crash!",
                "from": "a@b",
                "to": "c@d",
                "subject": "trollflow2 crash",
                "sendmail": str(fake_sendmail),
            },
        }
    )
    try:
        raise ValueError("boom")
    except ValueError as exc:
        handler({"uid": "m1"}, exc)
    mail = capture.read_text()
    assert "Subject: trollflow2 crash" in mail
    assert "boom" in mail and "m1" in mail


def test_resolve_crash_handler_names():
    from trollflow2_spark.streaming.runner import (
        CRASH_HANDLER_REGISTRY,
        crash_log,
        resolve_crash_handler,
    )

    assert resolve_crash_handler("log") is crash_log
    assert resolve_crash_handler(None) is None
    assert resolve_crash_handler(crash_log) is crash_log
    assert "reraise" in CRASH_HANDLER_REGISTRY
