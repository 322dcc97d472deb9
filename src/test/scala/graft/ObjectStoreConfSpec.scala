package graft

/** The conf-only object-store surface (VERDICT r14 item 7): the Spark
  * mapping of the reference's httpfs credentials block
  * (`create_enhanced_views.py:16-33`, `resources.py:203-342`). No network
  * in the sandbox, so the contract is that the conf ROUND-TRIPS — env →
  * ObjectStoreConf → fs.s3a.* properties → a live session's Hadoop conf.
  */
class ObjectStoreConfSpec extends SparkSpec {
  import GraftSession.ObjectStoreConf

  test("hadoop properties mirror the reference's httpfs knobs") {
    val c = ObjectStoreConf("http://minio.local:9000", "ak", "sk",
      pathStyle = true, ssl = false)
    val p = c.hadoopProps
    assert(p("fs.s3a.endpoint") == "http://minio.local:9000")
    assert(p("fs.s3a.access.key") == "ak")
    assert(p("fs.s3a.secret.key") == "sk")
    assert(p("fs.s3a.path.style.access") == "true")
    assert(p("fs.s3a.connection.ssl.enabled") == "false")
    // static creds, matching the reference's explicit-key setup (not an
    // instance-profile chain that would silently ignore the keys)
    assert(p("fs.s3a.aws.credentials.provider").contains("SimpleAWSCredentialsProvider"))
  }

  test("applyTo(session) round-trips through the live Hadoop configuration") {
    val c = ObjectStoreConf("http://store:9000", "id1", "secret1")
    val hc = spark.sparkContext.hadoopConfiguration
    val origKeys = c.hadoopProps.keys.map(k => k -> Option(hc.get(k))).toMap
    try {
      c.applyTo(spark)
      c.hadoopProps.foreach { case (k, v) =>
        assert(hc.get(k) == v, s"$k did not round-trip")
      }
    } finally origKeys.foreach {
      case (k, Some(v)) => hc.set(k, v)
      case (k, None) => hc.unset(k)
    }
  }

  test("fromEnv reads the reference's variable names; absent endpoint -> None") {
    assert(ObjectStoreConf.fromEnv(Map.empty).isEmpty)
    val got = ObjectStoreConf.fromEnv(Map(
      "S3_ENDPOINT" -> "http://e:9000",
      "S3_ACCESS_KEY_ID" -> "a",
      "S3_SECRET_ACCESS_KEY" -> "s",
      "S3_URL_STYLE" -> "vhost",
      "S3_USE_SSL" -> "true"))
    assert(got.contains(ObjectStoreConf("http://e:9000", "a", "s",
      pathStyle = false, ssl = true)))
    // defaults: path-style AND TLS on — the reference's own default
    // (resources.py:170 s3_use_ssl: "true"); an unset S3_USE_SSL must
    // not silently flip the TLS posture off
    val d = ObjectStoreConf.fromEnv(Map("S3_ENDPOINT" -> "http://e:9000")).get
    assert(d.pathStyle && d.ssl)
  }

  test("S3_USE_SSL parses shell-style booleans tolerantly; junk fails loud") {
    def ssl(v: String) = ObjectStoreConf.fromEnv(
      Map("S3_ENDPOINT" -> "http://e:9000", "S3_USE_SSL" -> v)).get.ssl
    assert(ssl("1") && ssl("true") && ssl("TRUE") && ssl("yes") && ssl("on"))
    assert(!ssl("0") && !ssl("false") && !ssl("False") && !ssl("no") && !ssl("off"))
    val e = intercept[IllegalArgumentException](ssl("maybe"))
    assert(e.getMessage.contains("S3_USE_SSL")) // names the variable
  }

  test("builder applyTo prefixes spark.hadoop. for executor propagation") {
    // Builder state isn't introspectable; verify via a pure fold over the
    // same props the builder receives.
    val c = ObjectStoreConf("http://e:9000", "a", "s")
    val asSubmitConf = c.hadoopProps.map { case (k, v) => ("spark.hadoop." + k, v) }
    assert(asSubmitConf.keys.forall(_.startsWith("spark.hadoop.fs.s3a.")))
    assert(asSubmitConf("spark.hadoop.fs.s3a.endpoint") == "http://e:9000")
  }
}
