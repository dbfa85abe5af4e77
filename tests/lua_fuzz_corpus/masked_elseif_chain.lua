-- bug class: masked elseif-chain short-circuit (round 2) — in a
-- lane-masked if/elseif/else chain every arm's guard must see only the
-- lanes that FELL THROUGH the earlier arms; returns inside arms merge
-- per-lane in chain order.
function f(x, y)
  if x > 1 then
    return x * 2, y
  elseif x > 0 then
    if y > 0 then return nil end
    return x + y, x - y
  elseif y > 1 then
    return y, x
  else
    return -x, -y
  end
end
