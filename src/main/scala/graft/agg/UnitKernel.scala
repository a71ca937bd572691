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

  // The full dimension dispatch of the reference's UnitMapper
  // (model/UnitMapper.scala:49-147), re-derived from public SI definitions —
  // each dimension anchored to one base unit, other units as exact factors.
  // Money is deliberately NOT in this static table: currency conversion is
  // exchange-rate-dependent (a live market context in squants), not a
  // physical constant — it is served by [[withMoney]], which takes the rate
  // snapshot as config; same-unit money also flows through Dimensionless.
  private val Pi = math.Pi
  private val linear: Seq[(String, Seq[(String, Double)])] = Seq(
    "Mass" -> Seq("g" -> 1.0, "kg" -> 1000.0, "mg" -> 0.001, "ug" -> 1e-6,
      "t" -> 1e6, "lb" -> 453.59237, "oz" -> 28.349523125, "st" -> 6350.29318, "ct" -> 0.2),
    "Length" -> Seq("m" -> 1.0, "km" -> 1000.0, "cm" -> 0.01, "mm" -> 0.001,
      "um" -> 1e-6, "nm" -> 1e-9, "mi" -> 1609.344, "ft" -> 0.3048, "in" -> 0.0254,
      "yd" -> 0.9144, "nmi" -> 1852.0, "au" -> 1.495978707e11, "ly" -> 9.4607304725808e15),
    "Time" -> Seq("s" -> 1.0, "ms" -> 0.001, "us" -> 1e-6, "ns" -> 1e-9,
      "min" -> 60.0, "h" -> 3600.0, "d" -> 86400.0, "w" -> 604800.0, "y" -> 31557600.0),
    "Information" -> Seq("B" -> 1.0, "KB" -> 1000.0, "MB" -> 1e6, "GB" -> 1e9,
      "TB" -> 1e12, "PB" -> 1e15, "KiB" -> 1024.0, "MiB" -> math.pow(1024, 2),
      "GiB" -> math.pow(1024, 3), "TiB" -> math.pow(1024, 4), "bit" -> 0.125),
    "DataRate" -> Seq("B/s" -> 1.0, "KB/s" -> 1000.0, "MB/s" -> 1e6, "GB/s" -> 1e9,
      "bps" -> 0.125, "Kbps" -> 125.0, "Mbps" -> 125000.0, "Gbps" -> 1.25e8),
    "Power" -> Seq("W" -> 1.0, "kW" -> 1000.0, "MW" -> 1e6, "GW" -> 1e9, "mW" -> 0.001,
      "hp" -> 745.6998715822702, "BTU/h" -> 1055.05585262 / 3600.0, "erg/s" -> 1e-7),
    "Energy" -> Seq("J" -> 1.0, "kJ" -> 1000.0, "MJ" -> 1e6, "GJ" -> 1e9,
      "Wh" -> 3600.0, "kWh" -> 3.6e6, "MWh" -> 3.6e9, "cal" -> 4.184, "kcal" -> 4184.0,
      "BTU" -> 1055.05585262, "erg" -> 1e-7, "eV" -> 1.602176634e-19),
    "Dimensionless" -> Seq("ea" -> 1.0, "%" -> 0.01, "dz" -> 12.0, "gross" -> 144.0, "score" -> 20.0),
    "Acceleration" -> Seq("m/s2" -> 1.0, "mm/s2" -> 0.001, "ft/s2" -> 0.3048, "g0" -> 9.80665),
    "Angle" -> Seq("rad" -> 1.0, "deg" -> Pi / 180.0, "grad" -> Pi / 200.0,
      "turn" -> 2 * Pi, "arcmin" -> Pi / 10800.0, "arcsec" -> Pi / 648000.0),
    "AngularAcceleration" -> Seq("rad/s2" -> 1.0, "deg/s2" -> Pi / 180.0,
      "grad/s2" -> Pi / 200.0, "turn/s2" -> 2 * Pi),
    "AngularVelocity" -> Seq("rad/s" -> 1.0, "deg/s" -> Pi / 180.0,
      "rpm" -> 2 * Pi / 60.0, "turn/s" -> 2 * Pi),
    "Area" -> Seq("m2" -> 1.0, "km2" -> 1e6, "cm2" -> 1e-4, "mm2" -> 1e-6,
      "ha" -> 1e4, "acre" -> 4046.8564224, "ft2" -> 0.09290304, "in2" -> 0.00064516),
    "AreaDensity" -> Seq("kg/m2" -> 1.0, "g/m2" -> 0.001, "kg/ha" -> 1e-4, "g/cm2" -> 10.0),
    "ChemicalAmount" -> Seq("mol" -> 1.0, "mmol" -> 0.001, "kmol" -> 1000.0, "lb-mol" -> 453.59237),
    "Density" -> Seq("kg/m3" -> 1.0, "g/L" -> 1.0, "g/cm3" -> 1000.0, "g/mL" -> 1000.0, "mg/L" -> 0.001),
    "Force" -> Seq("N" -> 1.0, "kN" -> 1000.0, "MN" -> 1e6, "lbf" -> 4.4482216152605,
      "kgf" -> 9.80665, "dyn" -> 1e-5),
    "Frequency" -> Seq("Hz" -> 1.0, "kHz" -> 1e3, "MHz" -> 1e6, "GHz" -> 1e9, "1/min" -> 1.0 / 60.0),
    "Illuminance" -> Seq("lx" -> 1.0, "fc" -> 10.763910416709722),
    "Irradiance" -> Seq("W/m2" -> 1.0, "kW/m2" -> 1000.0, "mW/cm2" -> 10.0),
    "Jerk" -> Seq("m/s3" -> 1.0, "ft/s3" -> 0.3048),
    "Luminance" -> Seq("cd/m2" -> 1.0, "nit" -> 1.0, "fL" -> 3.4262590996323),
    "LuminousEnergy" -> Seq("lm.s" -> 1.0, "lm.h" -> 3600.0),
    "LuminousExposure" -> Seq("lx.s" -> 1.0, "lx.h" -> 3600.0),
    "LuminousFlux" -> Seq("lm" -> 1.0),
    "LuminousIntensity" -> Seq("cd" -> 1.0),
    "MassFlow" -> Seq("kg/s" -> 1.0, "g/s" -> 0.001, "kg/h" -> 1.0 / 3600.0,
      "t/h" -> 1000.0 / 3600.0, "lb/s" -> 0.45359237, "lb/h" -> 0.45359237 / 3600.0),
    "Momentum" -> Seq("kg.m/s" -> 1.0, "g.cm/s" -> 1e-5),
    "MomentOfInertia" -> Seq("kg.m2" -> 1.0, "g.cm2" -> 1e-7,
      "lb.ft2" -> 0.45359237 * 0.3048 * 0.3048),
    "Pressure" -> Seq("Pa" -> 1.0, "kPa" -> 1e3, "MPa" -> 1e6, "bar" -> 1e5,
      "mbar" -> 100.0, "atm" -> 101325.0, "mmHg" -> 133.322387415,
      "psi" -> 6894.757293168361, "Torr" -> 101325.0 / 760.0),
    "PressureChange" -> Seq("Pa/s" -> 1.0, "bar/s" -> 1e5, "psi/s" -> 6894.757293168361),
    "Radiance" -> Seq("W/sr/m2" -> 1.0),
    "RadiantIntensity" -> Seq("W/sr" -> 1.0, "mW/sr" -> 0.001),
    "SolidAngle" -> Seq("sr" -> 1.0),
    "SpectralIntensity" -> Seq("W/sr/m" -> 1.0),
    "SpectralIrradiance" -> Seq("W/m3" -> 1.0, "W/m2/um" -> 1e6),
    "SpectralPower" -> Seq("W/m" -> 1.0),
    "ThermalCapacity" -> Seq("J/K" -> 1.0, "kJ/K" -> 1000.0, "cal/K" -> 4.184),
    "Torque" -> Seq("N.m" -> 1.0, "lbf.ft" -> 1.3558179483314004, "dyn.cm" -> 1e-7),
    "Velocity" -> Seq("m/s" -> 1.0, "km/h" -> 1.0 / 3.6, "mph" -> 0.44704,
      "kn" -> 1852.0 / 3600.0, "ft/s" -> 0.3048, "c" -> 299792458.0),
    "Volume" -> Seq("m3" -> 1.0, "L" -> 0.001, "mL" -> 1e-6, "cm3" -> 1e-6,
      "gal" -> 0.003785411784, "qt" -> 0.000946352946, "pt" -> 0.000473176473,
      "floz" -> 2.95735295625e-5, "ft3" -> 0.028316846592, "bbl" -> 0.158987294928),
    "VolumeFlow" -> Seq("m3/s" -> 1.0, "L/s" -> 0.001, "L/min" -> 0.001 / 60.0,
      "gal/min" -> 0.003785411784 / 60.0, "ft3/s" -> 0.028316846592),
    "Yank" -> Seq("N/s" -> 1.0, "kN/s" -> 1000.0),
  )

  private val affine: Seq[Unit] = Seq(
    Unit("K", "Temperature", 1.0, 0.0),
    Unit("C", "Temperature", 1.0, 273.15),
    Unit("F", "Temperature", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
    Unit("R", "Temperature", 5.0 / 9.0, 0.0), // Rankine
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

  /** The Money dispatch arm (reference model/UnitMapper.scala:49-147 routes
    * Money through a squants MoneyContext of market exchange rates). Rates
    * are NOT physical constants, so they arrive as CONFIG — a fixed
    * snapshot the caller owns, which is the engine's reproducibility
    * contract (a live feed would make aggregates non-replayable).
    * `rates(sym)` = value of 1 `sym` in the base currency; the base itself
    * is implicitly 1.0. Converts currencies and delegates every physical
    * dimension to the kernel, so it drops into
    * [[Aggregates.UnitStatsAggregator]] as a complete converter. */
  final class MoneyContext private[agg] (
      rates: Map[String, Double], val base: String) extends Serializable {
    require(math.abs(rates.getOrElse(base, 1.0) - 1.0) < 1e-12,
      s"base currency '$base' must have rate 1.0")
    private val money: Map[String, Unit] = (rates + (base -> 1.0)).map {
      case (sym, r) =>
        require(r > 0.0, s"rate for '$sym' must be positive, got $r")
        // a currency symbol that shadows a physical unit ("R" Rand vs
        // Rankine) would reroute previously-valid physical conversions into
        // the currency arm and crash them at runtime — reject at build time
        require(UnitKernel.dimensionOf(sym).isEmpty,
          s"currency symbol '$sym' collides with the physical unit " +
            s"'$sym' (${UnitKernel.dimensionOf(sym).get}); rename the " +
            "currency (e.g. ISO 4217 codes are collision-free)")
        sym -> Unit(sym, "Money", r)
    }
    def dimensionOf(symbol: String): Option[String] =
      money.get(symbol).map(_.dimension).orElse(UnitKernel.dimensionOf(symbol))
    def convert(value: Double, from: String, to: String): Double =
      (money.get(from), money.get(to)) match {
        case (Some(f), Some(t)) => value * f.factor / t.factor
        case (None, None) => UnitKernel.convert(value, from, to)
        case _ => throw new IllegalArgumentException(
          s"dimension mismatch: '$from' and '$to' are not both currencies")
      }
  }

  /** Build the fixed-rate Money arm; see [[MoneyContext]]. */
  def withMoney(rates: Map[String, Double], base: String = "USD"): MoneyContext =
    new MoneyContext(rates, base)
}
