-- late round 3: a lane-varying value reaching a string function must
-- fall back (Unvectorizable), never raise a script error the scalar
-- path wouldn't (string.format coerces numbers per lane there).
function f(x, y)
  local s = string.format("%.1f", x)
  return #s + y, x
end
