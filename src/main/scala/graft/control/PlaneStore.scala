package graft.control

import java.nio.file.{Files, Paths}

/** Persistence of the control plane as one canonical-JSON document next to
  * the lake (`_control.json`) — the CLI and the HTTP API share it, so
  * commands and requests compose across processes the way the reference's
  * management commands and views compose over its PostgreSQL control
  * tables. Reads of a missing document yield the empty plane. */
object PlaneStore {

  def path(lake: String): String = s"$lake/_control.json"

  def load(lake: String): Control.Plane = {
    val p = Paths.get(path(lake))
    if (Files.exists(p)) PlaneJson.fromJson(Files.readString(p))
    else Control.Plane(Map.empty)
  }

  def save(lake: String, plane: Control.Plane): Unit =
    Files.writeString(Paths.get(path(lake)), PlaneJson.toJson(plane))

  /** The control plane's timestamp rendering (`YYYY-MM-DD HH:MM:SS` UTC,
    * the reference's data_version format) — shared by the CLI and API. */
  def nowUtc(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
}
