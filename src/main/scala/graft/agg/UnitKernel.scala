package graft.agg

/** Minimal dimension/unit conversion kernel — the subset of the reference's
  * squants-based UnitMapper that its aggregates actually exercise
  * (reference model/UnitMapper.scala:24-37 symbol→unit creation and
  * within-dimension conversion; the ~45-dimension dispatch at 39-156 reduces
  * to "find the dimension, convert by ratio/affine"). squants is not on the
  * offline classpath, so this is a fresh, self-contained kernel.
  *
  * Linear dimensions convert through an SI-anchored factor; Temperature is
  * affine (scale + offset).
  */
object UnitKernel {

  final case class Unit(symbol: String, dimension: String, factor: Double, offset: Double = 0.0)

  private val linear: Seq[(String, Seq[(String, Double)])] = Seq(
    "Mass" -> Seq("g" -> 1.0, "kg" -> 1000.0, "mg" -> 0.001, "t" -> 1e6, "lb" -> 453.59237, "oz" -> 28.349523125),
    "Length" -> Seq("m" -> 1.0, "km" -> 1000.0, "cm" -> 0.01, "mm" -> 0.001, "mi" -> 1609.344, "ft" -> 0.3048, "in" -> 0.0254),
    "Time" -> Seq("s" -> 1.0, "ms" -> 0.001, "us" -> 1e-6, "ns" -> 1e-9, "min" -> 60.0, "h" -> 3600.0, "d" -> 86400.0),
    "Information" -> Seq("B" -> 1.0, "KB" -> 1000.0, "MB" -> 1e6, "GB" -> 1e9, "TB" -> 1e12, "KiB" -> 1024.0, "MiB" -> math.pow(1024, 2), "GiB" -> math.pow(1024, 3), "bit" -> 0.125),
    "Power" -> Seq("W" -> 1.0, "kW" -> 1000.0, "MW" -> 1e6, "mW" -> 0.001),
    "Energy" -> Seq("J" -> 1.0, "kJ" -> 1000.0, "Wh" -> 3600.0, "kWh" -> 3.6e6),
    "Dimensionless" -> Seq("ea" -> 1.0, "%" -> 0.01, "dz" -> 12.0),
  )

  private val affine: Seq[Unit] = Seq(
    Unit("K", "Temperature", 1.0, 0.0),
    Unit("C", "Temperature", 1.0, 273.15),
    Unit("F", "Temperature", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
  )

  val units: Map[String, Unit] =
    (linear.flatMap { case (dim, us) =>
      us.map { case (sym, f) => sym -> Unit(sym, dim, f) }
    } ++ affine.map(u => u.symbol -> u)).toMap

  def dimensionOf(symbol: String): Option[String] = units.get(symbol).map(_.dimension)

  /** Convert a value between two units of the same dimension
    * (the reference's UnitMapper.updateAggregateWith contract: incoming
    * (value, unit) is converted into the aggregate's preferred unit). */
  def convert(value: Double, from: String, to: String): Double = {
    val f = units.getOrElse(from, throw new IllegalArgumentException(s"unknown unit '$from'"))
    val t = units.getOrElse(to, throw new IllegalArgumentException(s"unknown unit '$to'"))
    require(f.dimension == t.dimension,
      s"dimension mismatch: $from is ${f.dimension}, $to is ${t.dimension}")
    // to base: v * factor + offset ; from base: (v - offset) / factor
    ((value * f.factor + f.offset) - t.offset) / t.factor
  }
}
