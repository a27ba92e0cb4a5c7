"""Auth family (signup/login/logout/current-user, B/web/api/auth.py) and
layered config broker (B/config.py) contracts."""

import pytest

from client_data_ingester_spark.auth import AuthError, AuthService, verify_password
from client_data_ingester_spark.config import ConfigBroker
from client_data_ingester_spark.schemas import CLIENTS_SCHEMA, USERS_SCHEMA
from client_data_ingester_spark.tables import SnapshotTable


@pytest.fixture()
def auth(tmp_path):
    users = SnapshotTable(str(tmp_path / "users"), USERS_SCHEMA, partition_col="id")
    clients = SnapshotTable(
        str(tmp_path / "clients"), CLIENTS_SCHEMA, partition_col="id"
    )
    return AuthService(users, clients)


def test_signup_login_logout_roundtrip(spark, auth):
    out = auth.signup(spark, "Acme", "a@x.com", "Alice", "pw123")
    assert out["client_id"] == 1 and out["user_id"] == 1
    token = auth.login(spark, "a@x.com", "pw123")
    me = auth.current_user(spark, token)
    assert me["client_id"] == 1 and me["company_name"] == "Acme"
    auth.logout(spark, token)
    with pytest.raises(AuthError):
        auth.current_user(spark, token)


def test_duplicate_email_rejected(spark, auth):
    auth.signup(spark, "Acme", "a@x.com", "Alice", "pw123")
    with pytest.raises(AuthError):
        auth.signup(spark, "Other", "a@x.com", "Bob", "pw456")


def test_wrong_password_rejected(spark, auth):
    auth.signup(spark, "Acme", "a@x.com", "Alice", "pw123")
    with pytest.raises(AuthError):
        auth.login(spark, "a@x.com", "nope")
    with pytest.raises(AuthError):
        auth.login(spark, "missing@x.com", "pw123")


def test_password_hash_is_salted_and_verifiable():
    from client_data_ingester_spark.auth import hash_password

    h1, h2 = hash_password("pw"), hash_password("pw")
    assert h1 != h2  # salted
    assert verify_password("pw", h1) and verify_password("pw", h2)
    assert not verify_password("other", h1)
    assert not verify_password("pw", "garbage")


def test_config_layering(tmp_path):
    f1 = tmp_path / "base.py"
    f1.write_text("table_root = '/data/t1'\ncustom = 1\n")
    f2 = tmp_path / "override.py"
    f2.write_text("table_root = '/data/t2'\n")
    cfg = ConfigBroker([str(f1), str(f2)])
    assert cfg.table_root == "/data/t2"  # later file wins
    assert cfg.custom == 1
    assert cfg.keep_versions == 3  # default preserved
    assert cfg.get("missing", "d") == "d"


def test_config_facade_exposes_registries():
    cfg = ConfigBroker()
    assert cfg.get_parser("csv") is not None
    assert cfg.get_transformer("decimal").id == "decimal"
    with pytest.raises(KeyError):
        cfg.get_parser("xml")


def test_config_file_sees_its_own_top_level_names(tmp_path):
    """Config files exec with ONE shared scope: a comprehension or helper
    function referencing an earlier top-level name must resolve it (split
    globals/locals would NameError — free names in comprehensions resolve
    against globals)."""
    f = tmp_path / "derived.py"
    f.write_text(
        "root = '/data'\n"
        "paths = [root + s for s in ['/a', '/b']]\n"
        "def _mk(s):\n"
        "    return root + s\n"
        "extra = _mk('/c')\n"
    )
    cfg = ConfigBroker([str(f)])
    assert cfg.paths == ["/data/a", "/data/b"]
    assert cfg.extra == "/data/c"


def test_concurrent_signups_mint_distinct_ids(spark, auth):
    """The optimistic read-modify-write guard: an interleaved writer that
    publishes between a signup's read and its publish must force a re-read
    — both signups get DISTINCT user/client ids and both rows survive."""
    a = auth.signup(spark, "CoA", "a@x.com", "A", "pw")
    b = auth.signup(spark, "CoB", "b@x.com", "B", "pw")
    assert a["user_id"] != b["user_id"]
    assert a["client_id"] != b["client_id"]
    emails = {
        r["email"] for r in auth.users.read(spark).collect()
    }
    assert {"a@x.com", "b@x.com"} <= emails


def test_overwrite_all_conflict_detection(spark, tmp_path):
    """overwrite_all(expected_version=...) is the auth layer's lost-update
    guard: publishing against a stale version raises instead of silently
    dropping the interleaved writer's rows."""
    import pytest

    from client_data_ingester_spark.schemas import CLIENTS_SCHEMA
    from client_data_ingester_spark.tables.snapshot import (
        SnapshotConflictError,
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path / "c"), CLIENTS_SCHEMA, partition_col="id")
    import datetime as dt

    df = spark.createDataFrame(
        [(1, "Co", dt.datetime(2026, 1, 1), None, True)],
        schema=CLIENTS_SCHEMA,
    )
    t.overwrite_all(df)  # v1
    with pytest.raises(SnapshotConflictError):
        t.overwrite_all(df, expected_version=0)  # stale read
    t.overwrite_all(df, expected_version=1)  # current read commits


def test_partition_col_must_be_a_schema_column(tmp_path):
    import pytest

    from client_data_ingester_spark.schemas import CLIENTS_SCHEMA
    from client_data_ingester_spark.tables.snapshot import SnapshotTable

    with pytest.raises(ValueError, match="partition_col"):
        SnapshotTable(str(tmp_path / "bad"), CLIENTS_SCHEMA)  # default col
