"""CLI tests against a live server (the cross-process path, SURVEY.md §3.5)."""

import json

import pytest

from fugu_tpu import cli
from tests.test_server import LiveServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = LiveServer(tmp_path_factory.mktemp("cli_data"))
    yield srv
    srv.stop()


def run(server, argv, capsys):
    rc = cli.run_cli(["--server", server.base] + argv)
    out = capsys.readouterr().out
    return rc, out


def test_namespace_add_and_list(server, capsys):
    rc, out = run(server, ["namespace", "add", "clins"], capsys)
    assert rc == 0
    assert json.loads(out)["status"] == "success"
    rc, out = run(server, ["namespace", "list"], capsys)
    assert "clins" in json.loads(out)["namespaces"]


def test_add_file_and_search(server, tmp_path, capsys):
    f = tmp_path / "notes.txt"
    f.write_text("zebras gallop across the savanna")
    rc, out = run(server, ["namespace", "add-file", "clins", str(f)], capsys)
    assert rc == 0
    assert json.loads(out)["status"] == "success"

    rc, out = run(server, ["namespace", "search", "clins", "zebras"], capsys)
    assert rc == 0
    payload = json.loads(out)
    assert payload["total"] == 1
    assert payload["results"][0]["id"] == "notes.txt"


def test_namespace_filters(server, capsys):
    rc, out = run(server, ["namespace", "filters", "namespace"], capsys)
    assert rc == 0
    assert "filters" in json.loads(out)


def test_dummy_item_and_get_object(server, capsys):
    rc, out = run(server, ["dummy-item", "--id", "dmy1"], capsys)
    assert rc == 0
    rc, out = run(server, ["get-object", "dmy1"], capsys)
    assert rc == 0
    assert json.loads(out)["id"] == ["dmy1"]


def test_get_object_missing_exits_nonzero(server, capsys):
    with pytest.raises(SystemExit):
        cli.run_cli(["--server", server.base, "get-object", "nope"])


def test_namespace_delete(server, capsys):
    rc, out = run(server, ["namespace", "delete", "clins"], capsys)
    assert rc == 0
    rc, out = run(server, ["namespace", "list"], capsys)
    assert "clins" not in json.loads(out)["namespaces"]


def test_connection_refused_friendly_error(capsys):
    rc = cli.run_cli(["--server", "http://127.0.0.1:9", "namespace", "list"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "could not reach server" in err
