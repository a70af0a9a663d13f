package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** `.env` loader spec (S4 — the reference's load_dotenv contract). */
class DotEnvSpec extends AnyFunSuite {

  private def envFile(content: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_env", ".env")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("parses keys, skips comments/blanks, strips quotes and export prefix") {
    val p = envFile(
      """# warehouse config
        |DATABASE=MODELLING
        |  SCHEMA = CANCER
        |DESTINATION_TABLE="HPV_UPTAKE"
        |export REGION='eu-west'
        |EMPTY=
        |WITH_EQ=a=b=c
        |
        |not a key value line
        |""".stripMargin)
    val m = DotEnv.parse(p)
    assert(m == Map(
      "DATABASE" -> "MODELLING",
      "SCHEMA" -> "CANCER",
      "DESTINATION_TABLE" -> "HPV_UPTAKE",
      "REGION" -> "eu-west",
      "EMPTY" -> "",
      "WITH_EQ" -> "a=b=c"))
  }

  test("missing file is a no-op and process env wins over file entries") {
    assert(DotEnv.parse("/nonexistent/.env").isEmpty)
    val fileVals = Map("PATH" -> "file-shadowed", "GRAFT_ONLY_IN_FILE" -> "x")
    // PATH is always present in the process env → env wins
    assert(DotEnv.get("PATH", fileVals, "dflt") == sys.env("PATH"))
    assert(DotEnv.get("GRAFT_ONLY_IN_FILE", fileVals, "dflt") == "x")
    assert(DotEnv.get("GRAFT_ABSENT_EVERYWHERE", fileVals, "dflt") == "dflt")
  }
}
