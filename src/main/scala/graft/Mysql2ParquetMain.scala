package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference binary's surface
  * (/root/reference/main.go:26-85): same eight flags with the same
  * defaults, --help / --version, help text on missing required flags,
  * exit code 0 for help/version and 1 for usage errors — plus the
  * engine's scale flags (partitioned scan, compat projection, explicit
  * JDBC url/driver) that the single-threaded reference has no analog
  * for.
  */
object Mysql2ParquetMain {

  /** Reference parity version (main.go:50) with the engine suffix. */
  val Version = "1.0.0-spark"

  val Usage: String =
    s"""mysql2parquet $Version.
       |Usage:
       |\tmysql2parquet [--help | --version ]
       |\tmysql2parquet --user=foo --password=1234 --database=foo --query="SELECT * FROM users" --parquet=users.parquet
       |Options:
       |  --help              Show this help.
       |  --version           Print version numbers.
       |  --user              User for login if not current user.
       |  --host              Connect to host.
       |  --port              Port number to use for connection.
       |  --password          Password to use when connecting to server.
       |  --database          Database to use.
       |  --query             Execute SQL and quit.
       |  --parquet           Directory name to save SQL result in parquet format.
       |Scale options (no reference analog):
       |  --session-init      Statement(s) run on each scan connection (SET ...).
       |  --partition-column  Numeric column to split the scan on (the query
       |                      is wrapped as a derived table, so it must be
       |                      legal as a subquery; a trailing ';' is stripped).
       |  --num-partitions    Parallel scan partitions (with --partition-column).
       |  --lower-bound       Partition column lower bound.
       |  --upper-bound       Partition column upper bound.
       |  --compat            Reference output semantics: stringify + NULL as "".
       |  --single-file       Coalesce output to one parquet file (compat).
       |  --url               Full JDBC url (overrides the MySQL DSN).
       |  --driver            JDBC driver class name.
       |Tips:
       |  Try to use any of session variables to perform the extraction, before query:
       |    SET TRANSACTION ISOLATION LEVEL READ UNCOMMITTED;
       |    SET SQL_BIG_SELECTS=1;
       |    SET SQL_BUFFER_RESULT=1;
       |  Prefix them inside --query ("SET ...; SELECT ...") exactly like the
       |  reference, or pass them via --session-init; either way every scan
       |  connection runs them before the query.
       |""".stripMargin

  /** Go strconv.ParseBool values (the reference's flag package), bare
    * flag = true.
    */
  private def parseBool(inline: Option[String]): Option[Boolean] = inline match {
    case None => Some(true)
    case Some(v) => v match {
      case "1" | "t" | "T" | "true" | "TRUE" | "True"      => Some(true)
      case "0" | "f" | "F" | "false" | "FALSE" | "False"   => Some(false)
      case _                                               => None
    }
  }

  /** Pure argv parser: Left((text, exitCode)) for help/version/errors,
    * Right(config) when the pipeline should run. Accepts --flag=value
    * and --flag value forms like the reference's Go flag package.
    */
  def parse(args: Array[String]): Either[(String, Int), Mysql2Parquet.Config] = {
    var c = Mysql2Parquet.Config()
    var i = 0
    def fail(msg: String) = Left((s"$msg\n\n$Usage", 1))
    while (i < args.length) {
      val arg = args(i)
      if (!arg.startsWith("--")) return fail(s"unexpected argument: $arg")
      val (name, inline) = arg.indexOf('=') match {
        case -1 => (arg.drop(2), None)
        case eq => (arg.substring(2, eq), Some(arg.substring(eq + 1)))
      }
      def value(): Either[(String, Int), String] = inline match {
        case Some(v) => Right(v)
        case None if i + 1 < args.length => i += 1; Right(args(i))
        case None => Left((s"flag --$name needs a value\n\n$Usage", 1))
      }
      def intValue(): Either[(String, Int), Int] =
        value().flatMap(v => v.toIntOption.toRight((s"flag --$name: '$v' is not an integer\n\n$Usage", 1)))
      def longValue(): Either[(String, Int), Long] =
        value().flatMap(v => v.toLongOption.toRight((s"flag --$name: '$v' is not an integer\n\n$Usage", 1)))
      name match {
        case "help"    => return Left((Usage, 0))
        case "version" => return Left((Version, 0))
        case "user"     => value() match { case Right(v) => c = c.copy(user = v);      case Left(e) => return Left(e) }
        case "host"     => value() match { case Right(v) => c = c.copy(host = v);      case Left(e) => return Left(e) }
        case "port"     => intValue() match { case Right(v) => c = c.copy(port = v);   case Left(e) => return Left(e) }
        case "password" => value() match { case Right(v) => c = c.copy(password = v);  case Left(e) => return Left(e) }
        case "database" => value() match { case Right(v) => c = c.copy(database = v);  case Left(e) => return Left(e) }
        case "query"    => value() match { case Right(v) => c = c.copy(query = v);     case Left(e) => return Left(e) }
        case "parquet"  => value() match { case Right(v) => c = c.copy(parquet = v);   case Left(e) => return Left(e) }
        case "session-init"     => value() match { case Right(v) => c = c.copy(sessionInit = Some(v)); case Left(e) => return Left(e) }
        case "partition-column" => value() match { case Right(v) => c = c.copy(partitionColumn = Some(v)); case Left(e) => return Left(e) }
        case "num-partitions"   => intValue() match { case Right(v) => c = c.copy(numPartitions = v); case Left(e) => return Left(e) }
        case "lower-bound"      => longValue() match { case Right(v) => c = c.copy(lowerBound = v); case Left(e) => return Left(e) }
        case "upper-bound"      => longValue() match { case Right(v) => c = c.copy(upperBound = v); case Left(e) => return Left(e) }
        case "compat" => parseBool(inline) match {
          case Some(b) => c = c.copy(compat = b)
          case None => return fail(s"flag --compat: '${inline.get}' is not a boolean")
        }
        case "single-file" => parseBool(inline) match {
          case Some(b) => c = c.copy(singleFile = b)
          case None => return fail(s"flag --single-file: '${inline.get}' is not a boolean")
        }
        case "url"    => value() match { case Right(v) => c = c.copy(url = Some(v));    case Left(e) => return Left(e) }
        case "driver" => value() match { case Right(v) => c = c.copy(driver = Some(v)); case Left(e) => return Left(e) }
        case other => return fail(s"unknown flag: --$other")
      }
      i += 1
    }
    // Same four required flags, same help-on-missing behavior as
    // main.go:77-85 (exit code 1).
    c.validate.left.map(msg => (s"$msg\n\n$Usage", 1))
  }

  /** The export pipeline on a live session — read (JDBC), optional
    * compat projection, parquet write.
    */
  def execute(spark: SparkSession, c: Mysql2Parquet.Config): Unit =
    Mysql2Parquet.run(Mysql2Parquet.reader(spark, c).load(), c)

  def main(args: Array[String]): Unit = parse(args) match {
    case Left((text, rc)) =>
      if (rc == 0) Console.out.println(text) else Console.err.println(text)
      sys.exit(rc)
    case Right(c) =>
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", s"local[${Runtime.getRuntime.availableProcessors}]"))
        .appName("mysql2parquet")
        .getOrCreate()
      try execute(spark, c) finally spark.stop()
  }
}
