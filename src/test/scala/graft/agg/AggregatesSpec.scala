package graft.agg

import graft.agg.Aggregates._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Goldens ported from the reference aggregate specs (values, not code):
  * MeanSpec (10,20,75 kg → 35), VarianceSpec (10,20,30,40 → 500/3),
  * ExponentialMovingAverageSpec (10,20,30 → 26.1),
  * ExponentialMovingVarianceSpec (10,20,30 → 41.79). */
class AggregatesSpec extends AnyFlatSpec with Matchers {

  behavior of "StatsBuffer"

  it should "match the reference Mean golden: mean(10,20,75) = 35" in {
    val b = Seq(10.0, 20.0, 75.0).foldLeft(StatsBuffer.empty)(_.add(_))
    Stats.of(b).mean shouldBe 35.0 +- 1e-12
  }

  it should "match the reference Variance golden: var(10,20,30,40) = 500/3 (sample)" in {
    val b = Seq(10.0, 20.0, 30.0, 40.0).foldLeft(StatsBuffer.empty)(_.add(_))
    Stats.of(b).variance shouldBe (500.0 / 3.0) +- 1e-9
    Stats.of(b).stddev shouldBe math.sqrt(500.0 / 3.0) +- 1e-9
  }

  it should "compute count/sum/min/max/range in one pass" in {
    val s = Stats.of(Seq(3.0, -1.0, 7.0).foldLeft(StatsBuffer.empty)(_.add(_)))
    s.count shouldBe 3
    s.sum shouldBe 9.0
    s.min shouldBe -1.0
    s.max shouldBe 7.0
    s.range shouldBe 8.0
  }

  it should "merge partials exactly (Chan et al.)" in {
    val xs = (1 to 100).map(_.toDouble)
    val whole = xs.foldLeft(StatsBuffer.empty)(_.add(_))
    val (l, r) = xs.splitAt(37)
    val merged = l.foldLeft(StatsBuffer.empty)(_.add(_))
      .merge(r.foldLeft(StatsBuffer.empty)(_.add(_)))
    Stats.of(merged).mean shouldBe Stats.of(whole).mean +- 1e-9
    Stats.of(merged).variance shouldBe Stats.of(whole).variance +- 1e-9
    merged.count shouldBe whole.count
  }

  behavior of "EmaFamily"

  it should "match the reference EMA golden: ema(10,20,30) = 26.1" in {
    EmaFamily.fold(Seq(10.0, 20.0, 30.0)).ema shouldBe 26.1 +- 1e-9
  }

  it should "match the reference EMV golden: emv(10,20,30) = 41.79 (pre-update EMA delta)" in {
    val s = EmaFamily.fold(Seq(10.0, 20.0, 30.0))
    s.emv shouldBe 41.79 +- 1e-4
    s.emsd shouldBe math.sqrt(41.79) +- 1e-4
  }

  it should "seed with the first value" in {
    EmaFamily.fold(Seq(42.0)).ema shouldBe 42.0
    EmaFamily.fold(Seq(42.0)).emv shouldBe 0.0
  }

  behavior of "MagnitudeBins"

  it should "bin by order of magnitude like the reference Histogram" in {
    // Reference Histogram.binOf code semantics: magnitude(0.0157) =
    // floor(log10) = -2 → bin [0.00, 0.10) at %.2f. (The reference's own
    // doc comment claims [0.01,0.02) but its code computes magnitude -2,
    // not -3 — we match the code, which is what its pipelines ran.)
    MagnitudeBins.binOf(0.0157) shouldBe "0.00,0.10"
    // same-magnitude values share bins; different magnitudes don't
    MagnitudeBins.binOf(157.0) should not be MagnitudeBins.binOf(15.7)
    MagnitudeBins.binOf(151.0) shouldBe MagnitudeBins.binOf(159.0)
  }

  behavior of "UnitKernel"

  it should "convert linear units within a dimension" in {
    UnitKernel.convert(1500.0, "g", "kg") shouldBe 1.5 +- 1e-12
    UnitKernel.convert(1.0, "mi", "km") shouldBe 1.609344 +- 1e-9
    UnitKernel.convert(2.0, "h", "min") shouldBe 120.0 +- 1e-12
    UnitKernel.convert(1.0, "GiB", "MiB") shouldBe 1024.0 +- 1e-9
  }

  it should "convert affine temperature units" in {
    UnitKernel.convert(0.0, "C", "F") shouldBe 32.0 +- 1e-9
    UnitKernel.convert(100.0, "C", "K") shouldBe 373.15 +- 1e-9
    UnitKernel.convert(-40.0, "F", "C") shouldBe -40.0 +- 1e-9
  }

  it should "reject cross-dimension conversion" in {
    an[IllegalArgumentException] should be thrownBy UnitKernel.convert(1.0, "kg", "m")
  }

  it should "cover the reference UnitMapper's dimension dispatch (sans Money)" in {
    // reference model/UnitMapper.scala:49-147 dispatches 45 dimensions;
    // Money is exchange-rate-dependent (excluded by design) → 44 here
    val dims = UnitKernel.units.values.map(_.dimension).toSet
    dims.size shouldBe 44
    dims should contain allOf ("Acceleration", "Angle", "AngularAcceleration",
      "AngularVelocity", "Area", "AreaDensity", "ChemicalAmount", "DataRate",
      "Density", "Force", "Frequency", "Illuminance", "Irradiance", "Jerk",
      "Luminance", "LuminousEnergy", "LuminousExposure", "LuminousFlux",
      "LuminousIntensity", "MassFlow", "Momentum", "MomentOfInertia",
      "Pressure", "PressureChange", "Radiance", "RadiantIntensity",
      "SolidAngle", "SpectralIntensity", "SpectralIrradiance", "SpectralPower",
      "ThermalCapacity", "Torque", "Velocity", "Volume", "VolumeFlow", "Yank")
    dims should not contain "Money"
  }

  it should "hold golden conversions across the extended dimensions" in {
    UnitKernel.convert(1.0, "atm", "Pa") shouldBe 101325.0 +- 1e-6
    UnitKernel.convert(60.0, "mph", "km/h") shouldBe 96.56064 +- 1e-9
    UnitKernel.convert(180.0, "deg", "rad") shouldBe math.Pi +- 1e-12
    UnitKernel.convert(1.0, "hp", "W") shouldBe 745.6998715822702 +- 1e-9
    UnitKernel.convert(1.0, "gal", "L") shouldBe 3.785411784 +- 1e-12
    UnitKernel.convert(1.0, "acre", "m2") shouldBe 4046.8564224 +- 1e-9
    UnitKernel.convert(1.0, "kWh", "MJ") shouldBe 3.6 +- 1e-12
    UnitKernel.convert(3600.0, "kg/h", "kg/s") shouldBe 1.0 +- 1e-12
    UnitKernel.convert(1.0, "Gbps", "MB/s") shouldBe 125.0 +- 1e-9
    UnitKernel.convert(491.67, "R", "F") shouldBe 32.0 +- 1e-9
    UnitKernel.convert(1.0, "rpm", "rad/s") shouldBe (2 * math.Pi / 60) +- 1e-12
  }

  it should "round-trip every unit through its dimension base exactly" in {
    // convert 7 units of x -> base -> back: identity within float tolerance
    val bases = UnitKernel.units.values.groupBy(_.dimension)
      .map { case (d, us) => d -> us.minBy(_.factor != 1.0) }
    UnitKernel.units.values.foreach { u =>
      val base = bases(u.dimension)
      val rt = UnitKernel.convert(UnitKernel.convert(7.0, u.symbol, base.symbol),
        base.symbol, u.symbol)
      withClue(s"${u.symbol} (${u.dimension}): ") { rt shouldBe 7.0 +- 1e-9 }
    }
  }

  it should "serve the Money arm from a config-supplied fixed-rate snapshot" in {
    // rates: value of 1 unit in the base currency (USD)
    val fx = UnitKernel.withMoney(Map("EUR" -> 1.08, "GBP" -> 1.27, "JPY" -> 0.0067))
    fx.convert(100.0, "EUR", "USD") shouldBe 108.0 +- 1e-9
    fx.convert(108.0, "USD", "EUR") shouldBe 100.0 +- 1e-9
    fx.convert(100.0, "EUR", "GBP") shouldBe (108.0 / 1.27) +- 1e-9
    fx.convert(1000.0, "JPY", "USD") shouldBe 6.7 +- 1e-9
    fx.dimensionOf("EUR") shouldBe Some("Money")
    // physical dimensions still dispatch through the kernel unchanged
    fx.convert(1.0, "kWh", "MJ") shouldBe 3.6 +- 1e-12
    fx.dimensionOf("kg") shouldBe Some("Mass")
    // money never silently converts to a physical dimension (or vice versa)
    an[IllegalArgumentException] should be thrownBy fx.convert(1.0, "EUR", "kg")
    an[IllegalArgumentException] should be thrownBy fx.convert(1.0, "kg", "EUR")
    an[IllegalArgumentException] should be thrownBy
      UnitKernel.withMoney(Map("EUR" -> -1.0))
    an[IllegalArgumentException] should be thrownBy
      UnitKernel.withMoney(Map("USD" -> 2.0)) // base must be 1.0
    // a currency symbol shadowing a physical unit ("R" Rand vs Rankine)
    // would reroute valid physical conversions into the currency arm —
    // rejected at build time
    val collide = the[IllegalArgumentException] thrownBy
      UnitKernel.withMoney(Map("R" -> 0.053))
    collide.getMessage should include("collides")

    // and it drops into the unit-aware aggregator as the converter
    val agg = new Aggregates.UnitStatsAggregator[(Double, String)](
      identity, "USD", fx.convert)
    val buf = Seq((100.0, "EUR"), (50.0, "USD"), (1000.0, "JPY"))
      .foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf).sum shouldBe (108.0 + 50.0 + 6.7) +- 1e-9
  }
}
